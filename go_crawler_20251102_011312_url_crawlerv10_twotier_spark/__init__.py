"""PySpark-native two-tier crawl frontier engine.

A from-scratch reimplementation of the capabilities of the reference
two-tier web crawler (``/root/reference``, Go + colly) as a batch
frontier-scheduler pipeline over columnar page tables, per SURVEY.md.

Nothing in here is a port: the reference is a row-at-a-time channel
dataflow; this engine declares every stage as a DataFrame plan
(Catalyst-optimized), with vectorized pandas/Arrow UDFs only for the
byte-exact HTML/URL semantics that built-in functions cannot express.

Subpackages
-----------
functions   scalar semantics: URL normalization (utils/utils.go:14-18),
            fast-path URL resolution (tokenizer/fastpath.go:109-127),
            routing (tokenizer/coordinator.go:42-99), text statistics.
operators   extract (tokenizer/fastpath.go:33-96, tokenizer/slowpath.go:57-132),
            dedup (exact / MinHash-LSH / SimHash / Jaccard / embedding),
            similarity search, politeness scheduling, multimodal plumbing.
sources     testdata loaders + deterministic synthetic `pages` corpus.
plans       the iterative frontier driver (BFS supersteps), checkpointing.
streaming   structured-streaming frontier feed (optional surface).
"""

from .session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
