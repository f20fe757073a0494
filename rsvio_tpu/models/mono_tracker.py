"""Mono feature tracker: temporal KLT + Shi-Tomasi grid detection, no stereo.

Capability parity with the reference's experimental crate tracker
(ref feature_tracker/src/feature_tracker.rs:24-77: configurable pyramid,
temporal track_points then Shi-Tomasi add_points, Feature{id, point}) and
with the unused mono PatchTracker of the main crate
(ref src/feature_tracker/feature_tracker.rs:37-89).

Built from the same batched primitives as the stereo frontend; useful for
mono datasets (TartanAir) and as the minimal tracking building block.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import detect, klt
from .frontend import birth_slots, masked_row_scatter


class MonoTrackerConfig(NamedTuple):
    capacity: int = 256
    cell_size: int = 30        # ref mono defaults grid 30 (feature_tracker.rs:84)
    detect_margin: int = 19
    min_score: float = 1.0     # Shi-Tomasi scores are small; low floor
    klt: klt.KLTConfig = klt.KLTConfig(max_iterations=30,
                                       convergence_threshold=0.005)
    # ref mono PatchTracker defaults: 30 iterations / 0.005 threshold
    # Detection mode: "grid" = per-cell argmax occupancy (main-crate
    # semantics, image_utilities.rs:108-175); "nms" = block NMS + min-dist
    # suppression against live tracks (experimental-crate semantics,
    # feature_detection.rs:172-254, 62-69).
    detect_mode: str = "grid"
    nms_radius: int = 10          # ref min_dist between features (px)
    nms_max_new: int = 128        # static candidate capacity in nms mode


class MonoTable(NamedTuple):
    pos: jnp.ndarray     # (N,2)
    A: jnp.ndarray       # (N,2,2)
    fid: jnp.ndarray     # (N,)
    alive: jnp.ndarray   # (N,)
    age: jnp.ndarray     # (N,)
    next_id: jnp.ndarray


def init_mono_table(capacity: int, dtype=jnp.float32) -> MonoTable:
    eye = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (capacity, 2, 2))
    return MonoTable(
        pos=jnp.zeros((capacity, 2), dtype=dtype), A=eye,
        fid=jnp.full((capacity,), -1, jnp.int32),
        alive=jnp.zeros((capacity,), dtype=bool),
        age=jnp.zeros((capacity,), jnp.int32),
        next_id=jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "first_frame"))
def mono_tracker_step(table: MonoTable, pyr_prev, pyr_cur,
                      cfg: MonoTrackerConfig, first_frame: bool = False):
    """One frame: temporal bidirectional KLT, then Shi-Tomasi births."""
    if first_frame:
        survived = jnp.zeros_like(table.alive)
        pos, A = table.pos, table.A
    else:
        pos, A, ok = klt.track_points_bidirectional(
            pyr_prev, pyr_cur, table.pos, table.alive, cfg.klt)
        survived = table.alive & ok
    table = table._replace(pos=pos, A=A, alive=survived,
                           age=jnp.where(survived, table.age + 1, 0))

    score = detect.shi_tomasi_score(pyr_cur[0])
    if cfg.detect_mode == "nms":
        cand_xy, cand_ok = detect.nms_select(
            score, table.pos, table.alive, cfg.nms_radius,
            margin=cfg.detect_margin, min_score=cfg.min_score,
            max_new=cfg.nms_max_new)
    else:
        cand_xy, cand_ok = detect.select_grid_features(
            score, table.pos, table.alive, cfg.cell_size,
            margin=cfg.detect_margin, min_score=cfg.min_score)

    # compact births into free slots (shared machinery with the stereo
    # frontend — dummy-row scatter avoids duplicate-index hazards)
    C = cand_ok.shape[0]
    slot, ok, rank = birth_slots(table.alive, cand_ok)
    eye = jnp.eye(2, dtype=table.A.dtype)
    table = table._replace(
        pos=masked_row_scatter(table.pos, slot, ok, cand_xy),
        A=masked_row_scatter(table.A, slot, ok,
                             jnp.broadcast_to(eye, (C, 2, 2))),
        fid=masked_row_scatter(table.fid, slot, ok, table.next_id + rank),
        alive=masked_row_scatter(table.alive, slot, ok,
                                 jnp.ones((C,), dtype=bool)),
        age=masked_row_scatter(table.age, slot, ok,
                               jnp.zeros((C,), jnp.int32)),
        next_id=table.next_id + jnp.sum(ok.astype(jnp.int32)))
    stats = {"tracked": jnp.sum(survived.astype(jnp.int32)),
             "alive": jnp.sum(table.alive.astype(jnp.int32))}
    return table, stats
