"""Flagship-scale capability artifacts from the trained 480p scene.

The reference's whole point is that ONE fitted video-Gaussian scene serves
tracking, editing, NVS, stereo and frame interpolation
(`/root/reference/src/trainer_fragGS.py:999-1676`). The unit tests cover
these at toy scale; this script demonstrates them at the production scale
of the flagship run (854x480, 131k capacity, 20k steps) from
`out/e480/final_scene.npz` and writes:

  out/e480/capability/
    tracking_f{00,12,24,36,47}.png   predicted track overlays
    edit_target.png / edit_t{0,24,47}.png  SH re-optimization edit + its
                                     temporal propagation
    nvs_orbit.{mp4|gif} + nvs_v*.png orbit novel views
    stereo_t{0,24}.png               anaglyph stereo
    interp_2x.{mp4|gif}              2x slow-motion (fractional times)
    layers_{fg,bg}.png               mask-attribute layer split
  CAPABILITY_480p.json               edit-region PSNR, interpolation
                                     temporal coherence, timings

Env: CAP_QUICK=1 shrinks everything for a CPU plumbing test.
CAP_SCENE=<path.npz> targets an alternate saved scene (e.g. the
E480_ATTR=1 mask-trained fit for a meaningful layer split);
CAP_ONLY=layers[,edit,...] runs only the named artifact sections and
merges their entries into the existing CAPABILITY_480p.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from splatter_a_video_tpu.utils.runtime import enable_compilation_cache, force_cpu

enable_compilation_cache()
QUICK = os.environ.get("CAP_QUICK", "0") == "1"
if os.environ.get("CAP_CPU", "0") == "1":
    force_cpu(1)

import jax
import jax.numpy as jnp
import numpy as np

from splatter_a_video_tpu import inference
from splatter_a_video_tpu.data import synthetic
from splatter_a_video_tpu.eval import metrics
from splatter_a_video_tpu.models import camera, gaussians, trajectory
from splatter_a_video_tpu.ops import rasterize
from splatter_a_video_tpu.utils import vis

t_all = time.time()
ROOT = os.path.join(os.path.dirname(__file__), "..")
OUTDIR = os.path.join(ROOT, "out", "e480", "capability")
os.makedirs(OUTDIR, exist_ok=True)
ONLY = set(filter(None, os.environ.get("CAP_ONLY", "").split(",")))


def section(name: str) -> bool:
    return not ONLY or name in ONLY


def save_png(name, img):
    import imageio.v2 as imageio

    imageio.imwrite(
        os.path.join(OUTDIR, name),
        np.clip(np.asarray(img) * 255, 0, 255).astype(np.uint8),
    )


# ---- load the flagship scene --------------------------------------------
if QUICK:
    W, H, T = 214, 120, 8
    clip = synthetic.make_clip(synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T, blob_radius=10.0, num_blobs=6,
        track_grid=8, texture=True,
    ))
    from splatter_a_video_tpu.train import fit as _fit

    scene, _ = _fit.build_scene_from_clip(
        clip, _fit.FitConfig(num_fg_samples=300, num_bg_samples=200,
                             init_num_points=600))
    MAXI = 1 << 15
else:
    W, H, T = 854, 480, 48
    npz = np.load(os.environ.get(
        "CAP_SCENE", os.path.join(ROOT, "out", "e480", "final_scene.npz")))
    cap = npz["position"].shape[0]
    n_knot_iv = npz["pos_cubic_coeff"].shape[2]
    scfg = gaussians.SceneConfig(
        capacity=cap, num_frames=T, traj="cubic_spline",
        render_attributes=(("mask_attribute", 1), ("dino_attribute", 3)),
    )
    params = {k: jnp.asarray(npz[k]) for k in npz.files if k != "alive"}
    # spline knots are deterministic in (T, frames_per_knot) — rebuild and
    # check the interval count matches the saved coefficients
    knots = trajectory.spline_knots(T, scfg.frames_per_knot)
    assert len(knots) == n_knot_iv + 1, (len(knots), n_knot_iv)
    aux = {"alive": jnp.asarray(npz["alive"]),
           "spline_knots": jnp.asarray(knots)}
    scene = gaussians.GaussianScene(params=params, aux=aux, cfg=scfg)
    # the SAME textured clip the scene was fitted on (frames depend only on
    # the geometry config; track_grid only thins the GT track queries)
    clip = synthetic.make_clip(synthetic.SyntheticClipConfig(
        width=W, height=H, num_frames=T, blob_radius=42.0, num_blobs=6,
        track_grid=8, texture=True,
    ))
    MAXI = 1 << 20

cam = camera.canonical_camera(W, H)
rcfg = rasterize.RasterizeConfig(width=W, height=H, max_intersections=MAXI)
extr = np.asarray(cam.extrinsic)
key_frames = [0, T // 4, T // 2, 3 * T // 4, T - 1]
mask0 = np.asarray(clip.get_mask(0)) > 0     # frame-0 fg (tracking + edit)
report = {"date": time.strftime("%Y-%m-%d"), "quick": QUICK,
          "scale": {"width": W, "height": H, "frames": T,
                    "capacity": int(scene.cfg.capacity),
                    "alive": int(scene.num_alive)},
          "timings_s": {}}
if ONLY:  # partial re-run: merge into the existing report
    prev = os.path.join(OUTDIR, "capability_480p.json")
    if os.path.exists(prev):
        with open(prev) as f:
            merged = json.load(f)
        merged.update({k: v for k, v in report.items() if k != "timings_s"})
        merged.setdefault("timings_s", {})
        report = merged
print(f"scene loaded: {int(scene.num_alive)} alive / {scene.cfg.capacity}",
      flush=True)

# sanity: the render must reproduce the fitted clip
t0 = time.time()
out0 = inference.render_frame(scene, 0.0, extr, rcfg)
psnr0 = float(metrics.psnr(np.clip(np.asarray(out0.features["rgb"]), 0, 1),
                           clip.frames[0]))
report["recon_psnr_f0"] = round(psnr0, 2)
report["timings_s"]["first_render"] = round(time.time() - t0, 1)
print(f"frame-0 recon PSNR {psnr0:.2f}", flush=True)

# ---- 1. tracking overlay -------------------------------------------------
if section("tracking"):
    # query points on the frame-0 fg mask; predicted trajectories from the
    # scene's own track_gs channel (trainer_fragGS.py:1614-1676)
    t0 = time.time()
    ys, xs = np.nonzero(mask0)
    rng = np.random.RandomState(0)
    NQ = 16 if QUICK else 48
    sel = rng.choice(len(ys), min(NQ, len(ys)), replace=False)
    px0 = np.stack([xs[sel], ys[sel]], axis=1).astype(np.float32)
    frames_id = list(range(T))
    tracks = np.zeros((len(px0), T, 2), np.float32)
    occl = np.zeros((len(px0), T), bool)
    for t2 in frames_id:
        px2, occ = inference.track_correspondences(scene, 0.0, px0, float(t2),
                                                   cam, rcfg)
        tracks[:, t2] = px2
        occl[:, t2] = occ
    key_frames = [0, T // 4, T // 2, 3 * T // 4, T - 1]
    for kf in key_frames:
        img = vis.draw_tracks_2d(clip.frames[kf], tracks[:, : kf + 1],
                                 radius=2, tail=12)
        save_png(f"tracking_f{kf:02d}.png", img)
    np.save(os.path.join(OUTDIR, "tracks_pred.npy"), tracks)
    report["timings_s"]["tracking"] = round(time.time() - t0, 1)
    report["tracking"] = {"num_queries": int(len(px0)),
                          "mean_occluded_frac": round(float(occl.mean()), 4)}
    print(f"tracking overlays done ({time.time() - t0:.0f}s)", flush=True)

# ---- 2. appearance edit --------------------------------------------------
if section("edit"):
    # recolor the fg region of frame 0 (channel rotation), select the
    # contributing gaussians under the mask, re-optimize their SH, and show
    # the edit propagating to later frames (trainer_fragGS.py:999-1064)
    t0 = time.time()
    target = clip.frames[0].copy()
    target[mask0] = target[mask0][:, [2, 0, 1]]          # rgb -> brg inside fg
    save_png("edit_target.png", target)
    sel_ids = inference.select_gaussians_by_mask(scene, mask0, cam, rcfg,
                                                 t=0.0, K_idx=10)
    edited = inference.optimize_appearance(
        scene, sel_ids, target, cam, rcfg, t=0.0,
        steps=100 if QUICK else 500,
    )
    edit_frames = {}
    for t in key_frames:
        o = inference.render_frame(edited, float(t), extr, rcfg)
        edit_frames[t] = np.clip(np.asarray(o.features["rgb"]), 0, 1)
        save_png(f"edit_t{t}.png", edit_frames[t])
    # edit-region PSNR at t=0 vs the edited target; outside-region PSNR vs the
    # untouched frame (the edit must stay local)
    m3 = mask0[..., None]
    edit_psnr = float(metrics.psnr(
        jnp.asarray(edit_frames[0] * m3), jnp.asarray(target * m3)))
    keep_psnr = float(metrics.psnr(
        jnp.asarray(edit_frames[0] * (1 - m3)),
        jnp.asarray(clip.frames[0] * (1 - m3))))
    report["edit"] = {"num_selected": int(len(sel_ids)),
                      "edit_region_psnr_t0": round(edit_psnr, 2),
                      "outside_region_psnr_t0": round(keep_psnr, 2)}
    report["timings_s"]["edit"] = round(time.time() - t0, 1)
    print(f"edit: {len(sel_ids)} gaussians, region PSNR {edit_psnr:.2f}, "
          f"outside {keep_psnr:.2f} ({time.time() - t0:.0f}s)", flush=True)

# ---- 3. NVS orbit --------------------------------------------------------
if section("nvs"):
    t0 = time.time()
    NV = 6 if QUICK else 16
    nvs = inference.render_nvs(scene, cam, rcfg,
                               times=np.linspace(0, T - 1, NV), radius=0.15)
    vis.write_video(os.path.join(OUTDIR, "nvs_orbit.mp4"), nvs, fps=8)
    for i in (0, NV // 2):
        save_png(f"nvs_v{i:02d}.png", nvs[i])
    report["timings_s"]["nvs"] = round(time.time() - t0, 1)
    print(f"nvs orbit done ({time.time() - t0:.0f}s)", flush=True)

# ---- 4. stereo -----------------------------------------------------------
if section("stereo"):
    t0 = time.time()
    st_times = [0.0, float(T // 2)]
    stereo = inference.render_stereo(scene, cam, rcfg, times=st_times)
    save_png("stereo_t0.png", stereo[0])
    save_png(f"stereo_t{T // 2}.png", stereo[1])
    report["timings_s"]["stereo"] = round(time.time() - t0, 1)
    print(f"stereo done ({time.time() - t0:.0f}s)", flush=True)

# ---- 5. 2x interpolation -------------------------------------------------
if section("interp"):
    # fractional times are free (continuous trajectory bases); temporal
    # coherence = how close f(t+.5) lands to the average of its neighbors,
    # normalized by the neighbor difference (0.5 = linear blend would score)
    t0 = time.time()
    NI = T // 4 if QUICK else T // 2
    times = np.arange(0, NI, 0.5, dtype=np.float32)
    res = inference.render_video(scene, cam, rcfg, list(times))
    vis.write_video(os.path.join(OUTDIR, "interp_2x.mp4"), res["rgb"], fps=16)
    mids = res["rgb"][1::2]
    ends = res["rgb"][0::2]
    tc = []
    for i in range(len(mids) - (0 if len(ends) > len(mids) else 1)):
        a, b, m = ends[i], ends[i + 1], mids[i]
        denom = np.abs(b - a).mean() + 1e-6
        tc.append(float(np.abs(m - 0.5 * (a + b)).mean() / denom))
    report["interp"] = {"frames_rendered": int(len(times)),
                        "tc_mid_vs_blend": round(float(np.mean(tc)), 4)}
    report["timings_s"]["interp"] = round(time.time() - t0, 1)
    print(f"interpolation done, tc={np.mean(tc):.4f} ({time.time() - t0:.0f}s)",
          flush=True)

# ---- 6. layer split ------------------------------------------------------
if section("layers"):
    t0 = time.time()
    fg_s, bg_s = inference.split_layers(scene)
    for name, s in (("fg", fg_s), ("bg", bg_s)):
        o = inference.render_frame(s, 0.0, extr, rcfg)
        save_png(f"layers_{name}.png",
                 np.clip(np.asarray(o.features["rgb"]), 0, 1))
    report["layers"] = {"fg_alive": int(fg_s.num_alive),
                        "bg_alive": int(bg_s.num_alive)}
    report["timings_s"]["layers"] = round(time.time() - t0, 1)

report["timings_s"]["total"] = round(time.time() - t_all, 1)
report["hardware"] = jax.devices()[0].device_kind
dest = os.path.join(ROOT, "CAPABILITY_480p.json")
with open(os.path.join(OUTDIR, "capability_480p.json"), "w") as f:
    json.dump(report, f, indent=2)
if not QUICK:
    with open(dest, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {os.path.abspath(dest)}", flush=True)
print(json.dumps(report), flush=True)
