"""Benchmark: DTU paper-eval full-pipeline inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "depth_maps/sec/chip", "vs_baseline": N}

Headline config — the reference's DTU evaluation setting (SURVEY.md §2.17,
``configs/dtu_wde3.yaml`` TEST section): 640×512 input, 5 views, D=96
coarse hypotheses, coarse + 3 PointFlow iterations at TEST scales
(0.25, 0.5, 1.0) → full-resolution 640×512 output, BatchNorm (the
reference's default norm), bf16 compute, 128-row flow banding.

Baseline provenance (``vs_baseline``): the Point-MVSNet paper's efficiency
section reports ~3 s per reference view for the full eval pipeline on a
consumer GPU (1080Ti class; BASELINE.md marks the exact value TBD-verify —
the reference mount is empty). BASELINE.json's target is ≥5× per chip vs a
V100; a V100 is roughly 1.3–1.5× a 1080Ti on this workload, so beating 5×
against 1/3 maps/s by a wide margin covers the V100 uncertainty band.
Secondary configs + per-stage latencies land in BENCH_DETAILS.json when
BENCH_DETAILS=1.

Runs on the real TPU via the axon tunnel (does NOT force the CPU backend).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 1.0 / 3.0  # paper-derived (~3 s/view, 1080Ti class)
BASELINE_SOURCE = ("Point-MVSNet paper efficiency section: ~3 s/view full "
                   "pipeline on 1080Ti-class GPU (TBD-verify; mount empty). "
                   "BASELINE.json target: >=5x vs V100.")


def make_inputs(b, v, h, w, d, with_gt=False):
    """Geometrically consistent synthetic scene (NOT noise — VERDICT r2
    weak #4): textured planes rendered per view, per-image standardized,
    DTU-like cams. Gather locality / softmax sharpness are representative."""
    import jax.numpy as jnp

    from pointmvsnet_tpu.dataset.synthetic import make_scene_batch
    images, cams, gt = make_scene_batch(b, v, h, w, d)
    out = (jnp.asarray(images), jnp.asarray(cams))
    if with_gt:
        out += (jnp.asarray(gt[..., None]),)
    return out


def build(norm="bn", dtype="bfloat16", chunk_rows=None, fetch=None):
    from pointmvsnet_tpu.config import get_default_cfg
    from pointmvsnet_tpu.models import build_model
    cfg = get_default_cfg()
    cfg.MODEL.NORM = norm
    cfg.MODEL.DTYPE = dtype
    if chunk_rows is not None:      # None = the shipped default (-1 AUTO,
        #                             which resolves to 128 at 640×512)
        cfg.MODEL.FLOW_CHUNK_ROWS = chunk_rows
    if fetch is None:
        fetch = os.environ.get("BENCH_FETCH", cfg.MODEL.FLOW_FETCH)
    cfg.MODEL.FLOW_FETCH = fetch
    if os.environ.get("BENCH_MOMENTS"):      # A/B the fused view moments
        cfg.MODEL.FLOW_MOMENTS = os.environ["BENCH_MOMENTS"]  # on|off|auto
    if os.environ.get("BENCH_SRC_DTYPE"):    # A/B the source-feature dtype
        cfg.MODEL.FLOW_SRC_DTYPE = os.environ["BENCH_SRC_DTYPE"]
    if os.environ.get("BENCH_COARSE_FETCH"):  # A/B the plane-sweep warp
        cfg.MODEL.COARSE_FETCH = os.environ["BENCH_COARSE_FETCH"]
    if os.environ.get("BENCH_CHUNK_ROWS"):   # A/B the flow band height
        cfg.MODEL.FLOW_CHUNK_ROWS = int(os.environ["BENCH_CHUNK_ROWS"])
    if os.environ.get("BENCH_REMAT_SAVE"):   # A/B the remat save policy
        cfg.MODEL.REMAT_SAVE = tuple(
            s for s in os.environ["BENCH_REMAT_SAVE"].split(",") if s)
    model, _, _ = build_model(cfg)
    return cfg, model


def measure(model, variables, images, cams, kwargs, iters=15):
    """Sustained maps/s: ``iters`` chained executions, ONE host sync.

    Each iteration consumes a zero-valued scalar derived from the previous
    iteration's output, so the device must run them back-to-back in order,
    and the single final materialization bounds ALL of them. Rationale:
    a host sync through the axon tunnel costs ~37 ms (measured — see
    docs/STATUS.md), so the former sync-per-output loop charged that to
    every sample; production eval streams scans exactly like this chain
    (plain block_until_ready is unreliable through the tunnel, hence the
    scalar materialization)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda var, im, cm: model.apply(var, im, cm, **kwargs),
        variables, images, cams)
    key = sorted(k for k in shapes if k.startswith("flow"))[-1] if any(
        k.startswith("flow") for k in shapes) else "coarse_depth_map"

    @jax.jit
    def fwd(var, im, cm, eps):
        out = model.apply(var, im + eps, cm, **kwargs)
        return out, (out[key].ravel()[0] * 0).astype(im.dtype)

    eps0 = jnp.zeros((), images.dtype)
    out, eps = fwd(variables, images, cams, eps0)
    np.asarray(out[key])                        # compile + first sync

    def window():
        nonlocal out, eps
        t0 = time.perf_counter()
        for _ in range(iters):
            out, eps = fwd(variables, images, cams, eps)
        checksum = float(out[key][0, 0, 0])     # ONE sync bounds the chain
        assert np.isfinite(checksum)
        return (time.perf_counter() - t0) / iters

    # Warmup window + best of two timed windows. The FIRST measured
    # window in a fresh chip/tunnel session reproducibly runs ~3.3×
    # slow and steady state holds from the second on (knob_ab_r5.json
    # base 729→218 ms, knob_ab_r5b.json base 707→207, BENCH_r04's 743 —
    # three independent sessions). A single-window measure records the
    # warmup artifact as the headline; best-of discards it.
    window()
    dt = min(window(), window())
    return images.shape[0] / dt, dt


def measure_train_step(batch_size=1, iters=8, with_stages=False):
    """Sustained train-step time at the reference DTU train config
    (V=3, D=48, 640×512, scales 0.25/0.5): fwd + loss + bwd + RMSprop in
    one jit with donated state. → dict for BENCH_DETAILS.

    batch_size=1 is the per-chip shard of the production data-parallel
    layout (and the unbanded flow graph's single-chip memory budget;
    B=2 unbanded needs 27 GB even with remat)."""
    import time as _time

    import jax

    from pointmvsnet_tpu.models import build_model
    from pointmvsnet_tpu.parallel import create_train_state, make_train_step
    from pointmvsnet_tpu.utils.solver import build_optimizer

    cfg, _ = build(chunk_rows=0)  # banding is an EVAL memory feature —
    #                               training runs unbanded (PointFlow doc)
    cfg.MODEL.REMAT = True   # recompute flow activations in backward —
    #                          the production setting for 640x512 training
    model, loss_fn, _ = build_model(cfg)
    b, v, h, w, d = batch_size, 3, 512, 640, 48
    images, cams, gt = make_inputs(b, v, h, w, d, with_gt=True)
    batch = {"images": images, "cams": cams, "gt_depth": gt}
    kwargs = dict(is_flow=True, img_scales=tuple(cfg.MODEL.TRAIN.IMG_SCALES),
                  inter_scales=tuple(cfg.MODEL.TRAIN.INTER_SCALES),
                  num_virtual_plane=d)
    opt = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch, kwargs)
    step = make_train_step(model, loss_fn, opt, None, kwargs)
    state, losses = step(state, batch)          # compile + warmup
    float(losses["total_loss"])
    t0 = _time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch)
    total = float(losses["total_loss"])         # sync once at the end
    dt = (_time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    out = {"batch_size": b, "steps_per_sec": 1.0 / dt,
           "samples_per_sec": b / dt, "step_latency_s": dt}
    if with_stages:
        from pointmvsnet_tpu.utils.profiler import train_stage_latencies
        out["stages_s"] = train_stage_latencies(model, loss_fn, opt, state,
                                                batch, kwargs)
    return out


def _device_watchdog(timeout_s: float = 300.0):
    """Fail fast (valid JSON line + exit) if device init hangs.

    The axon tunnel's claim leg retries forever when the relay endpoint is
    down (observed 2026-08-17: >5 h outage, ``jax.devices()`` blocked in a
    sleep loop) — without this guard the driver's bench run would hang
    instead of recording a diagnosable failure."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "dtu_eval_depth_maps_per_sec_per_chip_640x512_V5_D96_3flow",
                "value": 0.0,
                "unit": "depth_maps/sec/chip",
                "vs_baseline": 0.0,
                "error": f"device init exceeded {timeout_s:.0f}s "
                         f"(TPU tunnel unreachable?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def _progress(msg: str) -> None:
    """Timestamped progress note to stderr (the JSON contract owns stdout).

    Remote-TPU compiles through the tunnel cost 1-10 min each; without
    these marks a slow compile is indistinguishable from a hang."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()
_DETAILS = None  # live details dict, exposed so the crash handler can
#                  record a details-phase error into the artifact


def _flush_details(details) -> None:
    """Atomically replace BENCH_DETAILS.json (ADVICE r3: a kill mid-'w'
    write left a truncated file, worse than the stale one it replaced)."""
    tmp = "BENCH_DETAILS.json.tmp"
    with open(tmp, "w") as f:
        json.dump(details, f, indent=1)
    os.replace(tmp, "BENCH_DETAILS.json")


def main():
    import jax

    init_done = _device_watchdog()
    jax.devices()                       # blocks here if the tunnel is dead
    init_done.set()
    _progress("device up")

    from pointmvsnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    cfg, model = build()
    img_scales = tuple(cfg.MODEL.TEST.IMG_SCALES)      # (0.25, 0.5, 1.0)
    inter_scales = tuple(cfg.MODEL.TEST.INTER_SCALES)

    variables = model.init(jax.random.PRNGKey(0), *make_inputs(1, 2, 64, 64, 8),
                           is_flow=True, img_scales=(0.25,),
                           inter_scales=(0.75,), num_virtual_plane=8)
    _progress("model init done")

    # headline: paper-eval config (V=5, D=96, full-res output)
    b, v, h, w, d = 1, 5, 512, 640, 96
    images, cams = make_inputs(b, v, h, w, d)
    kwargs = dict(is_flow=True, img_scales=img_scales,
                  inter_scales=inter_scales, num_virtual_plane=d)
    _progress("headline compile+measure start")
    maps_per_sec, latency = measure(model, variables, images, cams, kwargs)
    _progress(f"headline done: {maps_per_sec:.3f} maps/s")

    # Print the contract line FIRST: the details section below recompiles
    # several large programs (stage profiler, V3/D48, batch2, train step) and
    # can take tens of minutes on a cold compile cache — the driver must get
    # its JSON even if it times this process out mid-details.
    global _JSON_EMITTED
    _JSON_EMITTED = True
    print(json.dumps({
        "metric": "dtu_eval_depth_maps_per_sec_per_chip_640x512_V5_D96_3flow",
        "value": round(maps_per_sec, 4),
        "unit": "depth_maps/sec/chip",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
        "baseline_source": "paper ~3s/view (1080Ti class); see BASELINE.md",
    }), flush=True)

    if os.environ.get("BENCH_DETAILS"):
        # complete=False until every section below has run — a timed-out
        # partial flush must be distinguishable from a finished record
        # (ADVICE r3: consumers KeyError'd on silently-missing sections).
        details = {"complete": False,
                   "headline_latency_s": latency,
                   # the knob triple every number in this file was measured
                   # under (docs-drift guard: numbers are meaningless
                   # without it — VERDICT r4 weak #2)
                   "measured_at": {
                       "FLOW_FETCH": cfg.MODEL.FLOW_FETCH,
                       "FLOW_MOMENTS": cfg.MODEL.FLOW_MOMENTS,
                       "COARSE_FETCH": cfg.MODEL.COARSE_FETCH,
                       "FLOW_CHUNK_ROWS": cfg.MODEL.FLOW_CHUNK_ROWS,
                       "FLOW_SRC_DTYPE": cfg.MODEL.FLOW_SRC_DTYPE,
                       "DTYPE": cfg.MODEL.DTYPE,
                       "NORM": cfg.MODEL.NORM,
                   },
                   "baseline_source": BASELINE_SOURCE}
        globals()["_DETAILS"] = details

        _flush_details(details)  # partial artifacts beat none if timed out

        def section(name, fn):
            """Run one details section; a failure is recorded, not fatal."""
            _progress(f"{name} start")
            try:
                details[name] = fn()
            except Exception as e:  # e.g. HBM exhaustion — report, move on
                details[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            _flush_details(details)

        # north-star stage decomposition at the headline config
        def _stages():
            from pointmvsnet_tpu.utils.profiler import stage_latencies
            return stage_latencies(model, variables, images, cams,
                                   img_scales, inter_scales, d)
        section("stages_s", _stages)

        # secondary: the train-shape config (V=3, D=48) at full-res output
        def _v3d48():
            im3, cm3 = make_inputs(1, 3, h, w, 48)
            kw3 = dict(kwargs, num_virtual_plane=48)
            mps3, lat3 = measure(model, variables, im3, cm3, kw3)
            return {"maps_per_sec": mps3, "latency_s": lat3}
        section("V3_D48_fullres", _v3d48)

        # batched multi-scan eval (BASELINE config #4): two ref views per
        # step through the same jit program — the eval engine's batched
        # path on one chip (a data mesh spreads the same batch across chips)
        def _batch2():
            imb, cmb = make_inputs(2, v, h, w, d)
            mpsb, latb = measure(model, variables, imb, cmb, kwargs, iters=8)
            return {"maps_per_sec": mpsb, "latency_s_per_batch": latb}
        section("V5_D96_batch2", _batch2)

        # analytic roofline: per-stage FLOPs/bytes/gather-rows vs v5e
        # peaks, joined with the measured in-situ marginals (VERDICT r4 #9)
        def _roofline():
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "benchmarks"))
            from roofline import roofline_table
            return roofline_table()
        section("roofline", _roofline)

        # training throughput at the reference train config (V=3, D=48,
        # 640x512 inputs, scales 0.25/0.5, masked loss, RMSprop)
        section("train_step", lambda: measure_train_step(with_stages=True))

        details["complete"] = True
        _flush_details(details)
        _progress("details done")


_JSON_EMITTED = False

if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        if not _JSON_EMITTED:  # a details-phase failure after the contract
            #                    line printed must not emit a second line
            print(json.dumps({
                "metric": ("dtu_eval_depth_maps_per_sec_per_chip"
                           "_640x512_V5_D96_3flow"),
                "value": 0.0,
                "unit": "depth_maps/sec/chip",
                "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}"[:300],
            }))
        else:
            # headline already printed: record the details-phase failure
            # INTO the artifact (ADVICE r3: a stderr-only note made a
            # failed details run look clean to automated drivers)
            _progress(f"details failed after headline: "
                      f"{type(e).__name__}: {e}"[:300])
            if _DETAILS is not None:
                _DETAILS["complete"] = False
                _DETAILS["details_error"] = f"{type(e).__name__}: {e}"[:300]
                try:
                    _flush_details(_DETAILS)
                except Exception:
                    pass
        sys.exit(0)
