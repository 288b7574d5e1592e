"""marginaliasearch_ray — a Ray-Data-native web-crawl frontier + converter engine.

A from-scratch reimplementation of the MarginaliaSearch crawler frontier,
fetch scheduler and converter text-extraction pipeline (reference:
MarginaliaSearch/MarginaliaSearch, Java) re-expressed as Ray Data pipelines:

- ``model``     — URL / domain canonical model (EdgeUrl / EdgeDomain semantics)
- ``functions`` — pure, vectorizable per-record functions (link parsing, text
                  extraction, content sniffing, LSH, robots, text statistics)
- ``stages``    — Ray Data ``map_batches`` stage callables (stateless fns and
                  actor-pool classes)
- ``sources``   — parquet readers/writers with column pruning & partitioning
- ``state``     — frontier shard state: queues, seen-filters (cuckoo),
                  politeness clocks, checkpointing
- ``pipelines`` — end-to-end drivers: crawl superstep loop, convert, rank
- ``fixtures``  — deterministic synthetic web generator + conformance oracle

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, the grading driver).
"""

__version__ = "0.1.0"
