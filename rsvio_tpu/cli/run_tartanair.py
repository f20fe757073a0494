"""TartanAir mono feature-tracking entry point.

Capability parity (SURVEY.md §2 #27 — ref
feature_tracker/src/bin/play_tartanair.rs + players/tartanair_player.rs):
drives the mono tracker (temporal bidirectional KLT + Shi-Tomasi births,
the experimental-crate capability set) over a TartanAir `image_left`
sequence, capped at 800 frames like the reference, with viewer hooks.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from .run import setup_logging

import logging

log = logging.getLogger("rsvio")


def main(argv=None):
    ap = argparse.ArgumentParser(description="Run TartanAir mono tracking")
    ap.add_argument("dataset_path", help="sequence dir containing image_left/")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument("--viewer-dir", default=None)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)
    setup_logging(verbose=not args.quiet)
    np.random.seed(42)

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..data.players import TartanAirPlayer, prefetch_frames
    from ..models import mono_tracker as mt
    from ..ops import pyramid
    from ..ops.klt import KLTConfig
    from ..viewers import create_viewer

    player = TartanAirPlayer(args.dataset_path)
    n = len(player) if args.max_frames is None else min(args.max_frames,
                                                        len(player))
    log.info("TartanAir: %d frames (processing %d)", len(player), n)
    viewer = create_viewer(args.viewer, args.viewer_dir)
    viewer_on = args.viewer or bool(args.viewer_dir)

    cfg = mt.MonoTrackerConfig(
        capacity=args.capacity,
        klt=KLTConfig(levels=args.levels, max_iterations=30,
                      convergence_threshold=0.005))
    table = mt.init_mono_table(args.capacity)
    pyr_prev = None
    times = []
    for k, frame in enumerate(prefetch_frames(player, 0, n)):
        t0 = time.time()
        pyr = pyramid.build_pyramid(jnp.asarray(frame.left), args.levels)
        table, stats = mt.mono_tracker_step(
            table, pyr_prev if pyr_prev is not None else pyr, pyr, cfg,
            first_frame=(pyr_prev is None))
        jax.block_until_ready(table.pos)
        pyr_prev = pyr
        times.append((time.time() - t0) * 1000.0)
        log.debug("[Timing] frame %d: %.1f ms | tracked=%d alive=%d",
                  k, times[-1], int(stats["tracked"]), int(stats["alive"]))
        if viewer_on:
            viewer.set_frame(k, frame.timestamp_ns)
            alive = np.asarray(table.alive)
            viewer.log_image_with_features_colored(
                "tartanair/left", frame.left,
                np.asarray(table.pos)[alive], np.asarray(table.fid)[alive])
    if times:
        avg = float(np.mean(times))
        log.info("%d frames, avg %.2f ms (%.1f fps)", len(times), avg,
                 1000.0 / avg)
        return 0
    return -1


if __name__ == "__main__":
    raise SystemExit(main())
