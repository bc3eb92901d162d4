"""Localhost Spark standalone cluster for process-isolated scaling runs.

The north_rule's scaling criterion compares N vs 4N *executors*. A
``local[N]`` vs ``local[4N]`` pair measures threads inside ONE JVM —
one heap, one GC, one python-worker pool — which BENCH.md §3 showed is
the dominant confounder on this box. This module stands up a real
standalone cluster on 127.0.0.1 (1 master + W worker JVMs, each worker
hosting one executor JVM with its own heap/GC/python workers), so the
N→4N comparison isolates processes the way a multi-node cluster does.
Only the memory bus, disk, and physical cores remain shared — the
irreducible single-box residue, quantified separately in BENCH.md §3.

Usage (context manager keeps cleanup unconditional):

    with StandaloneCluster(n_workers=4, cores_per_worker=4) as cl:
        env["SPARK_GRAFT_MASTER"] = cl.master_url
        ... run driver subprocess ...
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import tempfile
import time
import urllib.request

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")


class StandaloneCluster:
    """1 master + ``n_workers`` separate worker JVMs on localhost.

    Each worker offers ``cores_per_worker`` cores and ``worker_mem``
    to executors; the driver requests one executor per worker via
    ``spark.executor.cores == cores_per_worker``.
    """

    def __init__(
        self,
        n_workers: int,
        cores_per_worker: int = 4,
        worker_mem: str = "14g",
        master_port: int = 7077,
        webui_port: int = 8089,
        pin_cpus: bool = False,
    ) -> None:
        self.n_workers = n_workers
        self.cores_per_worker = cores_per_worker
        self.worker_mem = worker_mem
        self.master_port = master_port
        self.webui_port = webui_port
        self.master_url = f"spark://127.0.0.1:{master_port}"
        # CPU-fair mode: worker i (daemon + the executor JVM and
        # pyspark.daemon workers it spawns, which inherit affinity) is
        # tasksetted onto the DISTINCT vCPU slice
        # [i*cores, (i+1)*cores) — every worker gets identical silicon
        # and none can borrow the box's idle cores. Without pinning, a
        # 1-worker run free-rides on ~30 idle vCPUs (GC, IO, python
        # workers), inflating the small-N denominator of the N->4N
        # efficiency in a way no real per-node deployment reproduces.
        self.pin_cpus = pin_cpus
        self._procs: list[subprocess.Popen] = []
        self._tmp: str | None = None

    def worker_cpu_slice(self, i: int) -> str:
        c = self.cores_per_worker
        return f"{i * c}-{(i + 1) * c - 1}"

    # -- lifecycle -----------------------------------------------------
    def start(self, timeout: float = 60.0) -> None:
        self._tmp = tempfile.mkdtemp(prefix="spark-standalone-")
        env = dict(
            os.environ,
            SPARK_LOG_DIR=os.path.join(self._tmp, "logs"),
            SPARK_NO_DAEMONIZE="1",
        )
        # JVMs for master/worker daemons are tiny; the executors they
        # spawn get their memory from the driver's spark.executor.* conf.
        env["SPARK_DAEMON_MEMORY"] = "1g"
        self._spawn(
            [
                SPARK_CLASS,
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1",
                "--port", str(self.master_port),
                "--webui-port", str(self.webui_port),
            ],
            env,
            "master",
        )
        self._wait_master(timeout)
        for i in range(self.n_workers):
            wenv = dict(env, SPARK_WORKER_DIR=os.path.join(self._tmp, f"w{i}"))
            pin = (
                ["taskset", "-c", self.worker_cpu_slice(i)]
                if self.pin_cpus
                else []
            )
            self._spawn(
                pin
                + [
                    SPARK_CLASS,
                    "org.apache.spark.deploy.worker.Worker",
                    self.master_url,
                    "--host", "127.0.0.1",
                    "--cores", str(self.cores_per_worker),
                    "--memory", self.worker_mem,
                    "--webui-port", str(self.webui_port + 1 + i),
                ],
                wenv,
                f"worker{i}",
            )
        self._wait_workers(timeout)

    def stop(self) -> None:
        for p in reversed(self._procs):
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        deadline = time.time() + 15
        for p in self._procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
        self._procs.clear()
        if self._tmp:
            if os.environ.get("SPARK_GRAFT_KEEP_CLUSTER_LOGS"):
                print(f"[standalone_cluster] logs kept at {self._tmp}")
            else:
                shutil.rmtree(self._tmp, ignore_errors=True)
            self._tmp = None

    def __enter__(self) -> "StandaloneCluster":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- internals -----------------------------------------------------
    def _spawn(self, cmd: list[str], env: dict, tag: str) -> None:
        log = open(os.path.join(self._tmp, f"{tag}.log"), "wb")
        self._procs.append(
            subprocess.Popen(cmd, env=env, stdout=log, stderr=subprocess.STDOUT)
        )

    def _status(self) -> dict | None:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{self.webui_port}/json/", timeout=2
            ) as r:
                return json.load(r)
        except Exception:
            return None

    def _wait_master(self, timeout: float) -> None:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self._status() is not None:
                return
            time.sleep(0.5)
        raise RuntimeError("standalone master did not come up")

    def _wait_workers(self, timeout: float) -> None:
        deadline = time.time() + timeout
        n_alive = 0
        while time.time() < deadline:
            st = self._status() or {}
            n_alive = sum(
                1 for w in st.get("workers", []) if w.get("state") == "ALIVE"
            )
            if n_alive >= self.n_workers:
                return
            time.sleep(0.5)
        raise RuntimeError(f"only {n_alive}/{self.n_workers} workers registered")
