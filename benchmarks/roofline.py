"""Analytic roofline accounting for the headline DTU eval pipeline.

VERDICT r4 #9: relate every hot stage's measured latency to the resource
that bounds it — bf16 compute (MXU), HBM streaming bandwidth, or gather
row latency — so "is this fast yet?" has a principled answer. All counts
are derived from the model shapes (SURVEY.md §3.3/§3.4); no measurement
is needed to produce the table, but measured marginals (the in-situ
stub-ablation record, ``benchmarks/results/flow3_ablate_r4.json``) are
joined in when available.

v5e peaks used (public spec numbers): 197 bf16 TFLOP/s (MXU), 819 GB/s
HBM. Gather effective rate: ~11 GB/s / ~40 ns/row measured on this chip
(``benchmarks/gather_probe.py``) — gathers are ROW-LATENCY-bound, so
their ceiling is rows·40ns, not bytes/819GB/s.

Run:  python benchmarks/roofline.py     (prints markdown + JSON)
Import: ``roofline_table()`` → list of stage dicts (bench.py embeds it
in BENCH_DETAILS.json).
"""

from __future__ import annotations

import json

PEAK_BF16_TFLOPS = 197e12     # v5e MXU peak, bf16
PEAK_HBM_GBS = 819e9          # v5e HBM streaming bandwidth
GATHER_NS_PER_ROW = 40e-9     # measured: XLA row gather, flat in width


def _conv2d_flops(h, w, cin, cout, k, views=1):
    return 2 * h * w * cin * cout * k * k * views


def _image_conv_flops(h, w, c, views):
    """ImageConv pyramid FLOPs for one (B·V) call at input h×w (conv0..3
    stages; models/image_conv.py)."""
    f = 0
    f += _conv2d_flops(h, w, 3, c, 3, views) + _conv2d_flops(h, w, c, c, 3, views)
    h2, w2 = h // 2, w // 2
    f += (_conv2d_flops(h2, w2, c, 2 * c, 5, views)
          + 2 * _conv2d_flops(h2, w2, 2 * c, 2 * c, 3, views))
    h4, w4 = h // 4, w // 4
    f += (_conv2d_flops(h4, w4, 2 * c, 4 * c, 5, views)
          + 2 * _conv2d_flops(h4, w4, 4 * c, 4 * c, 3, views))
    h8, w8 = h // 8, w // 8
    f += (_conv2d_flops(h8, w8, 4 * c, 8 * c, 5, views)
          + 2 * _conv2d_flops(h8, w8, 8 * c, 8 * c, 3, views))
    return f


def roofline_table(h=512, w=640, v=5, d=96, g=5, base_c=8,
                   edge_channels=(32, 32, 64), flow_channels=(64, 64, 16, 1),
                   knn_window=5, k=16, measured_ms=None):
    """Per-stage FLOPs / bytes / binding resource at the eval config.

    ``measured_ms``: optional dict of stage → in-situ marginal (ms); the
    default joins the r4 stub-ablation record's flow3 numbers."""
    if measured_ms is None:
        measured_ms = {         # flow3_ablate_r4.json marginals (in-situ)
            "flow3_fetch": 151.7, "flow3_edgeconv": 54.0,
            "flow3_head_mlp": 35.0, "coarse_sweep_warp": 33.5,
            "flow3_knn": 19.4, "flow_pyramid(all iters)": 14.6,
            "volume_unet": 7.6, "ref_resample": 3.9,
        }
    cs = (base_c, 2 * base_c, 4 * base_c)          # pyramid channels 8/16/32
    sum_c = sum(cs)                                # 56
    n = h * w                                      # flow3 points per hypo
    gn = g * n
    src = v - 1
    stages = []

    def add(name, flops, stream_bytes, gather_rows=0, note=""):
        t_mxu = flops / PEAK_BF16_TFLOPS
        t_bw = stream_bytes / PEAK_HBM_GBS
        t_gather = gather_rows * GATHER_NS_PER_ROW
        ts = {"compute": t_mxu, "bandwidth": t_bw, "gather_rows": t_gather}
        bound = max(ts, key=ts.get)
        stages.append({
            "stage": name,
            "gflops": round(flops / 1e9, 1),
            "stream_mb": round(stream_bytes / 1e6, 1),
            "gather_rows_m": round(gather_rows / 1e6, 2),
            "ceiling_ms": round(max(ts.values()) * 1e3, 2),
            "bound_by": bound,
            "measured_ms": measured_ms.get(name),
            "note": note,
        })

    # --- coarse stage -----------------------------------------------------
    ch, cw = h // 8, w // 8                        # coarse feature res 64x80
    add("coarse_sweep_warp",
        # MXU path: one-hot(block x span) @ slab per 512-pt block
        flops=2 * d * ch * cw * src * 1536 * 4 * cs[2],
        stream_bytes=d * ch * cw * src * 4 * cs[2] * 4,   # gathered rows out
        gather_rows=0,
        note="COARSE_FETCH=mxu: FLOP cost of the one-hot slab matmul; "
             "'take' path instead = D*h*w*src gather rows")
    add("volume_unet",
        flops=2 * 60 * d * ch * cw * 8 * 8 * 27,   # ~3D U-Net conv stack
        stream_bytes=4 * d * ch * cw * cs[2] * 4,
        note="3-level 3D U-Net over (D,h/8,w/8); rough conv count")
    add("flow_pyramid(all iters)",
        flops=_image_conv_flops(h, w, base_c, v)
        + _image_conv_flops(h // 4, w // 4, base_c, v),
        stream_bytes=2 * v * (h * w * 3 + h * w * base_c * 2) * 4,
        note="shared 2D CNN, views folded into batch (flow2 reuses the "
             "coarse pyramid)")

    # --- flow3 iteration (dominant) ---------------------------------------
    table_rows = (h + 1) * (w + 1)
    row_bytes = 4 * sum_c * 4                      # 4-tap patch row, f32
    add("flow3_fetch",
        flops=0,
        stream_bytes=(src * table_rows * row_bytes          # table build
                      + src * gn * sum_c * 4                # fetched output
                      + src * gn * row_bytes),              # gathered rows
        gather_rows=src * gn,
        note="table engine: 1 wide row gather per (src view, hypothesis "
             "point); bilinear engine = 3 narrow gathers -> 3x rows (yet "
             "measured faster in situ — smaller tables/working set). "
             "Binding resource is row latency.")
    add("ref_resample",
        flops=2 * n * (w * 2 + h * 2) * sum_c // 100,       # separable matmuls
        stream_bytes=g * n * sum_c * 4,
        note="reference-view separable-matmul resample (MXU)")
    # kNN: windowed distance + top-k over the structured grid
    win_pts = g * knn_window * knn_window
    add("flow3_knn",
        flops=2 * gn * win_pts * 3 + gn * win_pts * 8,
        stream_bytes=gn * (3 * 4 + k * 4),
        note="windowed Pallas kNN: distances + packed-key selection")
    # EdgeConv stack: SharedMLP matmuls + masked-window-max
    f_edge = 0
    cin = sum_c
    for cout in edge_channels:
        f_edge += 2 * gn * (2 * cin) * cout        # edge MLP (concat trick)
        f_edge += gn * cout * win_pts              # window-max compare ops
        cin = cout
    add("flow3_edgeconv",
        flops=f_edge,
        stream_bytes=gn * (sum_c + sum(edge_channels)) * 4 * 2,
        note="z-trick split matmul + masked-window-max Pallas kernel "
             "(VPU compare-bound, counted as FLOPs here)")
    f_head = 0
    cin = sum(edge_channels)
    for cout in flow_channels:
        f_head += 2 * gn * cin * cout
        cin = cout
    add("flow3_head_mlp",
        flops=f_head,
        stream_bytes=gn * (sum(edge_channels) + flow_channels[0]) * 4,
        note="SharedMLP logits head; MXU, bf16")
    return stages


def main():
    stages = roofline_table()
    hdr = ("| stage | GFLOP | stream MB | gather Mrows | ceiling ms | "
           "bound by | measured ms |")
    print(hdr)
    print("|" + "---|" * 7)
    for s in stages:
        print(f"| {s['stage']} | {s['gflops']} | {s['stream_mb']} | "
              f"{s['gather_rows_m']} | {s['ceiling_ms']} | {s['bound_by']} | "
              f"{s['measured_ms']} |")
    print()
    print(json.dumps(stages, indent=1))


if __name__ == "__main__":
    main()
