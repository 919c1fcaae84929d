"""Multi-chip distribution (SURVEY.md §5.8: new design, no reference analogue).

The only parallel axis this workload needs is the photon axis: pure data
parallelism. ``shard_trace`` wraps a tracer's jitted batch function in
``shard_map`` over a 1D device mesh — photons sharded, scene/material/RNG
parameters replicated, per-chip partial histograms and event statistics
combined with ``psum`` over ICI. RNG streams are the *global* path indices,
so results are independent of the device count (the multi-chip analogue of
the reference's stream/offset scheme, SURVEY.md §2.2).
"""

from .dataparallel import make_photon_mesh, shard_trace, sharded_streams

__all__ = ["make_photon_mesh", "shard_trace", "sharded_streams"]
