"""Search/build statistics.

TPU-native analog of the reference's stats traits
(reference: pgvectorscale/src/access_method/stats.rs — per-counter traits
``StatsDistanceComparison``, ``StatsNodeRead``, ``StatsNodeVisit``, and the
aggregates ``GreedySearchStats``, ``WriteStats``; dumped at query end by
amendscan, scan.rs:439-476).

On TPU the counters are device scalars carried through the jitted search
(SearchResult.n_visited / n_dist_comps) and summarized host-side here.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class GreedySearchStats:
    """Per-batch search statistics (GreedySearchStats analog)."""

    num_queries: int = 0
    total_visits: int = 0
    total_distance_comparisons: int = 0
    iterations: int = 0

    @classmethod
    def from_search_result(cls, result) -> "GreedySearchStats":
        n_visited = np.asarray(result.n_visited)
        n_comps = np.asarray(result.n_dist_comps)
        return cls(
            num_queries=int(n_visited.shape[0]),
            total_visits=int(n_visited.sum()),
            total_distance_comparisons=int(n_comps.sum()),
            iterations=int(result.iters),
        )

    def merge(self, other: "GreedySearchStats") -> "GreedySearchStats":
        return GreedySearchStats(
            num_queries=self.num_queries + other.num_queries,
            total_visits=self.total_visits + other.total_visits,
            total_distance_comparisons=(
                self.total_distance_comparisons
                + other.total_distance_comparisons
            ),
            iterations=max(self.iterations, other.iterations),
        )


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a device profile around a build/search region.

    The TPU analog of the reference's compile-time tracing hooks
    (SURVEY.md §5: per-page/per-comparison counters, stats.rs:3-27):
    wraps the region in a ``jax.profiler`` trace whose output is viewable
    in TensorBoard/XProf (per-kernel device timelines, HBM usage).

        with profiler_trace("/tmp/trace"):
            index.search(queries)

    Also exposed as ``--profile-dir`` on the CLI search/build commands.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class WriteStats:
    """Build timing/throughput (WriteStats analog, stats.rs:242-265).

    Counter semantics on TPU (the reference counts per-tuple
    ``prune_neighbors`` calls; here work is batched):

    - ``num_waves``: fused wave-step dispatches (insert + refine waves);
      each wave batch-prunes every inserted node's candidate set.
    - ``num_prunes``: over-degree rows re-pruned host-visibly during
      ``finalize`` (the finalize_index_build analog, build.rs:905-960).
      In-wave overflow prunes run inside the fused step and are not
      separately counted.
    - ``insert_s`` / ``finalize_s``: wall-clock of the two phases.
    """

    started: float = dataclasses.field(default_factory=time.perf_counter)
    num_nodes: int = 0
    num_waves: int = 0
    num_prunes: int = 0
    insert_s: float = 0.0
    finalize_s: float = 0.0

    @property
    def elapsed_s(self) -> float:
        return time.perf_counter() - self.started

    @property
    def nodes_per_sec(self) -> float:
        e = self.elapsed_s
        return self.num_nodes / e if e > 0 else 0.0
