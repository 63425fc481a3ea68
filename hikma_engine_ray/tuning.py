"""Central Ray Data context tuning, applied by every entry point that
owns (or joins) a Ray session: ``bench.py``, ``__ray_entry__``'s
``entry()``/``queries()`` callables, the CLI, and the test fixture.

Why this exists: the streaming executor's per-operator resource
reservation (``op_resource_reservation_enabled``, default on) reserves
a fixed share of the CPU budget for EVERY operator in the DAG. Our
flagship topologies are wide — one materialized parse output fans out
into 4+ kind-filter branches that re-join through unions and two
all-to-all exchanges, ~15 operators in a single execution — so the
reservation splinters 32 CPUs into per-operator slivers and the
critical path runs nearly serial while most cores idle. Measured on
the 20k-file corpus (sf0.1 tier, 32 CPUs, this box): the link shuffle
topology runs 14.8-18.7 s with reservation on, 6.8-7.4 s with it off —
a 2.2-2.7x end-to-end penalty for a scheduler safeguard we don't need
(the safeguard exists to stop a downstream operator from being starved
of resources under object-store pressure mid-stream; our stages bound
their memory via data-sized block counts and combiner-first partials,
and the object store is sized with >2x headroom in bench runs).

At multi-node scale the same reasoning holds per node: reservation
carves each node's slots across the whole operator graph regardless of
where the stream's working set actually is. Re-enable it (or simply
don't call this) for pipelines with unbounded per-operator buffering.
"""

from __future__ import annotations

import os


def apply_malloc_env() -> None:
    """Set glibc malloc thresholds so large transient arrays (signature
    matrices, shuffle buffers) are served from the retained heap instead
    of a fresh mmap per allocation. glibc munmaps such blocks on free,
    so every batch re-faults its pages — measured on this host (slow
    demand paging) a 133 MiB kernel intermediate cost 26-63 s per batch
    mmap'd vs 0.1-0.3 s reused. Must run BEFORE ``ray.init``: glibc
    reads these at process start, so they only affect the raylet and
    the workers it spawns, never the already-running driver. setdefault
    keeps any operator-provided values."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))


def apply_context_defaults() -> None:
    """Idempotent; call after ray.init() (or before — the context is a
    process-global singleton picked up at execution time)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
