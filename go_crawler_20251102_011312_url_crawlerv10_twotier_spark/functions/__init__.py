from . import predicates, routing, textstats, urlnorm  # noqa: F401
