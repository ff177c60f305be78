"""HBM capacity planning for large builds.

The reference never plans memory — it reports bytes after the fact
(collection.hpp:249-254) and a build that doesn't fit just thrashes. On
TPU the budget is hard (HBM ~16GB on v5e) and the sharded build
(parallel/sharded.py build_sharded) can split every per-point structure,
so the right question is "how many chips does this build need?" — answered
here analytically, before any allocation.

Estimates model the structures build_index/build_sharded actually
materialize (measured dominant terms at 1M+ points, ROUND_NOTES):

- f32 normalized vectors            n*d*4
- bf16 scan copy (+bias col, pad)   n_pad * dpad * 2      [dense paths]
- per-table sorted hash + idx       L * n * 8
- packed (id, sketch, cluster) rec  L * n_pad * (2+W) * 4 [global engine]
- sketches                          n * S * W * 4
- prefix directories + geometry     (small, counted)

Transient workspace (score tiles, sort scratch) lives in VMEM or is
pipelined by XLA; `headroom` reserves HBM for it plus the allocator's
fragmentation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

from clann_tpu.config import Config

HBM_V5E = 16 * 1024**3


def _scan_pad(n: int, k: int) -> int:
    from clann_tpu.ops.ivf import pallas_scan_plan

    block_n = pallas_scan_plan(n, k)[0]
    return -(-n // block_n) * block_n


@dataclasses.dataclass(frozen=True)
class CapacityPlan:
    """Byte budget of one build and the mesh it needs."""

    per_structure: Dict[str, int]
    shardable_bytes: int  # splits across devices (per-point/per-slot data)
    replicated_bytes: int  # lives on every device (params, directories)
    hbm_bytes: int
    usable_bytes: int  # hbm * (1 - headroom)
    fits_single_chip: bool
    min_devices: int  # smallest count where a shard + replicated fits
    recommended_devices: int  # min_devices rounded up to a power of two

    @property
    def total_bytes(self) -> int:
        return self.shardable_bytes + self.replicated_bytes


def plan_capacity(
    n: int,
    d: int,
    config: Config = None,
    hbm_bytes: int = HBM_V5E,
    headroom: float = 0.25,
) -> CapacityPlan:
    """Plan the device count for an n x d angular build under `config`.

    headroom: fraction of HBM reserved for transient workspace (batched
    score/sort buffers, allocator fragmentation). 0.25 matches the
    measured single-chip ceiling (~30M points of the ~40M that raw
    arithmetic suggests at d=100, PERFORMANCE.md "Scale" section).
    """
    cfg = config or Config()
    L = cfg.num_tables
    S = cfg.num_sketches
    W = cfg.sketch_bits // 32
    C = cfg.num_clusters(n)
    n_pad = _scan_pad(n, cfg.k)
    dpad = -(-(d + 1) // 128) * 128
    n_slot = n + ((-n) % max(1, cfg.gather_block))

    per: Dict[str, int] = {"vectors_f32": n * d * 4}
    if cfg.dense_layout:
        per["scan_copy_bf16"] = n_pad * dpad * 2
        per["dense_geometry"] = C * (d + 2) * 4
    # the fused-kernel serving path keeps ITS OWN padded bf16 base
    # (ops/ivf._PALLAS_BASE_CACHE), distinct from dense_layout's plain
    # scan copy — both are resident when the headline path serves. Below
    # the measured crossover the router never builds it
    # (ops/ivf.pallas_scan_viable), so it only counts at kernel scales.
    # Witnessed (CAPACITY_EDGE.json, round 5): without this term the
    # planner accepted 11M and 13M x 100 single-chip, and both OOM'd;
    # with it the edge lands at ~10M — the size round 1 measured working.
    from clann_tpu.ops.ivf import pallas_scan_viable

    if pallas_scan_viable(n, d):
        per["pallas_scan_base_bf16"] = n_pad * dpad * 2
    per["tables_hash_idx"] = L * n * 8
    per["sketches"] = n * S * W * 4
    if cfg.pack_slot_records:
        per["slot_records"] = L * n_slot * (2 + W) * 4
    if cfg.lsh_engine in ("global", "both"):
        per["g_tables"] = L * n * 4
        per["g_records"] = L * n_slot * (2 + W) * 4
        per["g_dir"] = L * ((1 << cfg.global_dir_bits) + 1) * 4
    if cfg.lsh_engine in ("clustered", "both"):
        per["prefix_dir"] = L * C * ((1 << cfg.prefix_dir_bits) + 1) * 4
    per["cluster_geometry"] = C * (d + 4) * 4
    # hash/sketch function parameters (replicated, tiny): planes/signs
    per["hash_params"] = L * cfg.max_hashbits * d * 4 + S * cfg.sketch_bits * d * 4

    replicated = (
        per.get("g_dir", 0)
        + per.get("prefix_dir", 0)
        + per["cluster_geometry"]
        + per["hash_params"]
    )
    shardable = sum(per.values()) - replicated

    usable = int(hbm_bytes * (1.0 - headroom))
    avail = max(1, usable - replicated)
    min_dev = max(1, math.ceil(shardable / avail))
    rec = 1 << (min_dev - 1).bit_length()
    return CapacityPlan(
        per_structure=per,
        shardable_bytes=int(shardable),
        replicated_bytes=int(replicated),
        hbm_bytes=int(hbm_bytes),
        usable_bytes=usable,
        fits_single_chip=shardable + replicated <= usable,
        min_devices=min_dev,
        recommended_devices=rec,
    )
