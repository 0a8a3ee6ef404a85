"""Demo app shell: the reference's main scene + ImGui panel, offline.

Runs the default 3-cascade ocean (main.tscn presets), renders shaded frames
with the C12 lighting model, optionally animates spray particles, and prints
the live parameter/metrics panel — the capabilities of the reference's
interactive shell (C1) re-expressed as a headless CLI.

Examples:
  python demo.py --frames 8 --out /tmp/ocean            # PNG frame sequence
  python demo.py --gif /tmp/ocean.gif --frames 48       # animated GIF
  python demo.py --cpu --map-size 128 --gif /tmp/o.gif  # no TPU needed
  python demo.py --map-size 512 --wind-speed 25 --panel
  python demo.py --live                                 # interactive viewer:
      live ANSI ocean view; keys edit every cascade parameter at runtime
      (1-9 cascade, tab param, +/- adjust, C/c add/remove cascade, r resolution,
      u/U update rate, q)
  python demo.py --web --port 8000                      # browser viewer:
      live shaded render + slider panel for every parameter at
      http://localhost:8000 (utils/webviewer.py)
"""
from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np

from godotoceanwaves_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from godotoceanwaves_tpu import Ocean
from godotoceanwaves_tpu.utils.observability import FrameStats, panel


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--map-size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--fps", type=float, default=25.0)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--warmup", type=int, default=30,
                    help="simulation updates before the first rendered frame")
    ap.add_argument("--wind-speed", type=float, default=None,
                    help="override cascade 0 wind speed (m/s)")
    ap.add_argument("--updates-per-second", type=float, default=0.0)
    ap.add_argument("--spray", action="store_true", help="simulate spray particles")
    ap.add_argument("--spray-particles", type=int, default=32768,
                    help="particle count (reference scale: 32768, main.tscn:137)")
    ap.add_argument("--out", type=str, default=None, help="PNG frame directory")
    ap.add_argument("--gif", type=str, default=None, help="animated GIF path")
    ap.add_argument("--panel", action="store_true", help="print the parameter panel")
    ap.add_argument("--live", action="store_true",
                    help="interactive terminal viewer with runtime editing")
    ap.add_argument("--web", action="store_true",
                    help="browser viewer: live render + parameter panel")
    ap.add_argument("--port", type=int, default=8000, help="--web port")
    ap.add_argument("--environment", action="store_true",
                    help="apply the reference scene's fog/tonemap post "
                         "(main.tscn:22-41) to rendered frames")
    ap.add_argument("--flat", action="store_true",
                    help="legacy flat-plane render (no displaced geometry); "
                         "default renders the vertex-displaced clipmap mesh "
                         "with silhouettes/parallax (water.gdshader:29-38)")
    ap.add_argument("--mesh-quality", choices=("low", "high"), default="high",
                    help="clipmap mesh grading (water.gd:43-46)")
    ap.add_argument("--render-tier",
                    choices=("quality", "interactive", "performance"),
                    default=None,
                    help="render knob preset (models/viewport.RENDER_TIERS; "
                         "offline frames default to full quality, the web "
                         "viewer to 'interactive')")
    ap.add_argument("--render-scale", type=int, default=1,
                    help="dynamic resolution: march/shade at 1/s resolution "
                         "and upsample the finished frame on device (Godot "
                         "viewport render-scale analog; width/height must "
                         "be divisible by s)")
    ap.add_argument("--camera", type=str, default="0,12,0",
                    help="camera position X,Y,Z (offline frames)")
    ap.add_argument("--pitch", type=float, default=-12.0,
                    help="camera pitch degrees (negative looks down)")
    ap.add_argument("--yaw", type=float, default=0.0,
                    help="camera yaw degrees")
    ap.add_argument("--specular-aa", action="store_true",
                    help="screen-space specular anti-aliasing (widens the "
                         "GGX lobe by the normal's screen-space variance — "
                         "dims isolated glint sparkles; opt-in, not in the "
                         "reference)")
    ap.add_argument("--frame-batch", type=int, default=1,
                    help="--web: K-frame dispatch batching (1-8; one jitted "
                         "program per K served frames — throughput mode, "
                         "docs/PERF.md 'viewer K-frame dispatch batching')")
    ap.add_argument("--fov", type=float, default=70.0,
                    help="camera field of view, degrees (reference panel "
                         "range 20-170, main.gd:113-114)")
    ap.add_argument("--ambience", type=str, default=None,
                    help="write the wind-mixed procedural ambience loop "
                         "(WAV) for the current cascade stack")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (renders anywhere, incl. "
                         "while the TPU relay is down; env vars alone "
                         "cannot switch the platform here)")
    args = ap.parse_args()

    if args.specular_aa and args.flat:
        # reject rather than silently drop: the library raises the same way
        ap.error("--specular-aa needs the geometry render path (no --flat)")

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.ambience:
        # host-only: the mix law needs only the cascade wind speeds, so read
        # them from the scene source of truth (cascade.DEFAULT_SCENE, the
        # dicts default_cascades() builds from) as plain NumPy — constructing
        # jnp params (let alone an Ocean) would block on device/backend init
        import types

        from godotoceanwaves_tpu.models.cascade import DEFAULT_SCENE
        from godotoceanwaves_tpu.utils import audio
        ws = np.array([c["wind_speed"] for c in DEFAULT_SCENE], np.float32)
        if args.wind_speed is not None:
            ws[0] = args.wind_speed
        params = types.SimpleNamespace(wind_speed=ws)
        sr = 22050
        audio.write_wav(args.ambience,
                        audio.render_ambience(params, sample_rate=sr), sr)
        print(f"ambience loop -> {args.ambience} "
              f"(gains db={audio.ambience_gains_db(float(ws.sum()))})")
        return

    ocean = Ocean(map_size=args.map_size,
                  updates_per_second=args.updates_per_second)
    if args.wind_speed is not None:
        ocean.set_cascade(0, wind_speed=args.wind_speed)

    if args.live:
        from godotoceanwaves_tpu.utils.live import LiveViewer
        LiveViewer(ocean, fps=args.fps, mesh_quality=args.mesh_quality,
                   spray=args.spray,
                   spray_particles=args.spray_particles).run()
        return

    if args.web:
        from godotoceanwaves_tpu.utils.webviewer import WebViewer
        # cap 30: the round-4 tuned render leaves the loop relay-bound
        WebViewer(ocean, fps=min(args.fps, 30.0),
                  width=args.width, height=args.height, flat=args.flat,
                  mesh_quality=args.mesh_quality, spray=args.spray,
                  spray_particles=args.spray_particles,
                  render_tier=args.render_tier or "interactive",
                  render_scale=args.render_scale,
                  frame_batch=args.frame_batch,
                  specular_aa=args.specular_aa
                  ).run(port=args.port)
        return

    stats = FrameStats()

    dt = 1.0 / args.fps
    maps = None
    for _ in range(args.warmup):
        maps = ocean.update(dt) or maps

    # shared jitted render/spray plumbing (models/viewport): one device
    # dispatch per frame — eager chains are seconds-per-frame through the
    # tunnel relay — with spray composited INSIDE the render jit and the
    # uint8 quantize on device. The session's global colors (water.gd:14-18)
    # and the camera pose ride as traced args. Default path renders the
    # vertex-displaced clipmap mesh (models/geometry.py) — silhouettes and
    # parallax, the reference's defining visual; --flat keeps the y=0
    # raycast.
    from godotoceanwaves_tpu.models.viewport import (FramePipeline,
                                                     SceneRenderer,
                                                     SpraySession)
    from godotoceanwaves_tpu.models.viewport import RENDER_TIERS
    tier_kw = dict(RENDER_TIERS[args.render_tier or "quality"])
    if args.render_scale > 1:
        tier_kw["render_scale"] = args.render_scale
    if args.specular_aa:
        tier_kw["specular_aa"] = True   # rides shade_kwargs into shade()
    viewport = SceneRenderer(args.width, args.height, flat=args.flat,
                             mesh_quality=args.mesh_quality,
                             environment=args.environment, **tier_kw)
    spray_session = SpraySession(num_particles=args.spray_particles) \
        if args.spray else None

    frames = []
    scales = ocean.params.map_scales()
    cam_pos = tuple(float(v) for v in args.camera.split(","))
    # pipelined fetch: frame N's 0.7 MB host copy overlaps frame N+1's
    # device work (models/viewport.FramePipeline, docs/PERF.md)
    pipeline = FramePipeline()
    for i in range(args.frames):
        t0 = time.perf_counter()
        maps = ocean.update(dt) or maps
        attrs = (spray_session.advance(maps, scales, dt)
                 if spray_session is not None else None)
        img = viewport.render(maps, scales, ocean.water_color,
                              ocean.foam_color, cam_pos, args.pitch,
                              args.yaw, fov=args.fov, spray_attrs=attrs)
        host = pipeline.push(img)
        if host is not None:
            frames.append(host)
        stats.record(time.perf_counter() - t0)
    last = pipeline.flush()
    if last is not None:
        frames.append(last)

    if args.out:
        outdir = pathlib.Path(args.out)
        outdir.mkdir(parents=True, exist_ok=True)
        from PIL import Image
        for i, arr in enumerate(frames):
            Image.fromarray(arr).save(outdir / f"frame_{i:04d}.png")
        print(f"wrote {len(frames)} frames to {outdir}")
    if args.gif:
        from PIL import Image
        imgs = [Image.fromarray(a) for a in frames]
        imgs[0].save(args.gif, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / args.fps), loop=0)
        print(f"wrote {args.gif}")
    if args.panel or not (args.out or args.gif):
        print(panel(ocean, stats))


if __name__ == "__main__":
    main()
