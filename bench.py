"""Benchmark runner — prints the driver summary JSON line, un-losably.

Headline metric (BASELINE.json): Mrays/s on the cornell + glass-bunny
scenes; target > 100 Mrays/s per v5e chip.  Runs on whatever backend the
environment provides (the driver supplies the real TPU).

Robustness contract (learned from round 3, where a driver timeout while
compiling scene 3 lost the whole round's metric):
  * the headline scene (cornell MIS) runs FIRST;
  * after EVERY scene the full summary line (results so far) is printed to
    stdout and flushed — the driver takes the last line, so a kill at any
    point still leaves a valid record;
  * SIGTERM/SIGINT/SIGALRM are trapped to emit-and-exit-0 (`timeout`
    sends SIGTERM);
  * each new scene only starts while under 60% of the wall budget
    (BENCH_BUDGET_S, default 480 s), and a self-alarm fires at the budget.

Rays are counted as the reference would issue them: one primary/bounce ray
per live path per depth plus NEE shadow rays (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

_HERE = Path(__file__).resolve().parent

# Headline first: even a 1-scene run records the metric of record.
# The analytic scenes run with cross-iteration ray regeneration (r5,
# RenderOptions.ray_regen — one-window ABAB A/Bs with identical traced-ray
# counts: cornell MIS 157->194 (k=8) -> ~200 (k=16), cornell BSDF 97->118,
# dielectric 87->126, mis_test 34->62; PARITY.md r5 section).  One
# executable serves every k (the batch size is traced), so k=16 costs no
# extra compile.  Mesh/env/texture scenes measured regen-negative and
# stay classic.
SCENES = [
    # (name, path, mode, spp, depth_override, opts_extra)
    ("cornell_mis", "/root/reference/scenes/cornell.txt", "mis", 32, None,
     {"ray_regen": 16}),
    # 48-spp window: at 32 spp the artifact of record logged 99.36 Mrays/s
    # vs 104.7 measured single-window (r4 VERDICT item 3) — the longer
    # window amortizes dispatch-drift so the recorded number matches the
    # steady state
    ("cornell", "/root/reference/scenes/cornell.txt", "bsdf", 48, None,
     {"ray_regen": 16}),
    ("glassbunny", str(_HERE / "scenes/glassbunny.txt"), "mis", 8, None, {}),
    # short-iteration scenes need a >=12-spp window or the measurement is
    # dominated by dispatch pipeline fill (envbunny k-sweep r4: 22.1
    # Mrays/s at a 16-spp window vs 18.2 at 4-spp; k=2/4/8 flat, so the
    # fix is window length, not batching depth)
    ("envbunny", str(_HERE / "scenes/envbunny.txt"), "mis", 12, None, {}),
    ("texturecube", str(_HERE / "scenes/texturecube.txt"), "mis", 16, None,
     {}),
    # showcase rows (regen's biggest wins); the 60%-budget gate keeps them
    # from ever endangering the five rows above
    ("mis_test", "/root/reference/scenes/mis_test.txt", "mis", 24, None,
     {"ray_regen": 16}),
    ("dielectric", "/root/reference/scenes/dielectric_test.txt", "bsdf", 32,
     None, {"ray_regen": 16}),
]

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
_START = time.time()
_RESULTS: list[dict] = []


_SIGS = (signal.SIGTERM, signal.SIGINT, signal.SIGALRM)


def emit() -> None:
    """Write the full summary line from results-so-far (driver takes the
    last stdout line).  The line is built first and written with ONE
    os.write (atomic for this size), with the trapped signals blocked, so
    a signal landing mid-emit can never interleave the handler's output
    with a partially written line."""
    if not _RESULTS:
        line = {
            "metric": "cornell_800x800_mis_throughput",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
        }
    else:
        headline = next(
            (r for r in _RESULTS if r["scene"] == "cornell_mis"), _RESULTS[0]
        )
        value = headline["mrays_per_sec"]
        line = {
            "metric": "cornell_800x800_mis_throughput",
            "value": value,
            "unit": "Mrays/s",
            # BASELINE.json north-star target: 100 Mrays/s per chip
            "vs_baseline": round(value / 100.0, 4),
            "detail": list(_RESULTS),
        }
    data = (json.dumps(line) + "\n").encode()
    old = signal.pthread_sigmask(signal.SIG_BLOCK, set(_SIGS))
    try:
        sys.stdout.flush()
        os.write(1, data)
    finally:
        signal.pthread_sigmask(signal.SIG_SETMASK, old)


def _die(signum, frame):  # noqa: ARG001 - signal signature
    print(f"# bench: signal {signum} after {time.time() - _START:.0f}s, "
          f"{len(_RESULTS)} scenes done — emitting and exiting 0",
          file=sys.stderr, flush=True)
    emit()
    os._exit(0)


for _sig in _SIGS:
    signal.signal(_sig, _die)


def bench_scene(name, path, mode, spp, depth, opts_extra=None):
    from pathtracer_tpu.integrator.render import Renderer
    from pathtracer_tpu.utils.config import RenderOptions, SampleMode

    mode_map = {
        "bsdf": SampleMode.BSDF,
        "direct": SampleMode.DIRECT_LI,
        "mis": SampleMode.MIS,
    }
    r = Renderer(
        path,
        opts=RenderOptions(sample_mode=mode_map[mode], **(opts_extra or {})),
        trace_depth=depth,
    )
    r.step(2)  # compile + warm
    r.stats.wall_seconds = 0.0
    r.stats.rays_traced = 0
    stats = r.step(spp)
    return {
        "scene": name,
        "mode": mode,
        "resolution": [r.width, r.height],
        "spp": spp,
        "wall_seconds": round(stats.wall_seconds, 4),
        "rays": stats.rays_traced,
        "mrays_per_sec": round(stats.mrays_per_sec, 3),
    }


def main():
    signal.alarm(int(BUDGET_S))  # self-deadline inside any driver timeout
    for name, path, mode, spp, depth, opts_extra in SCENES:
        if not Path(path).exists():
            continue
        elapsed = time.time() - _START
        if _RESULTS and elapsed > 0.6 * BUDGET_S:
            print(f"# bench: skipping {name} ({elapsed:.0f}s elapsed of "
                  f"{BUDGET_S:.0f}s budget)", file=sys.stderr, flush=True)
            continue
        try:
            _RESULTS.append(bench_scene(name, path, mode, spp, depth,
                                        opts_extra))
            print(f"# {_RESULTS[-1]}", file=sys.stderr, flush=True)
        except Exception as e:  # keep the headline line emitting
            print(f"# bench {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        emit()
    if not _RESULTS:
        emit()
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
