"""Measure the web viewer's steady-state serving rate through HTTP.

Starts a WebViewer (1024^2 bf16 maps, spray on) on an ephemeral port, waits
for the sim thread to reach steady state, and samples the served-frame
counter over a minute — the end-to-end figure the PERF.md "viewer loop"
ledger records. An optional argv[1] of rgb|yuv420 pins the wire format
(A/B the transfer: run once per format in the same session); an optional
argv[2] WIDTHxHEIGHT sets the surface size (default 640x360), argv[3]
the render_scale (dynamic resolution — the 720p/1080p single-chip lever),
and argv[4] the fps cap (default 30; pass 240 for the UNCAPPED ceiling —
the round-5 verdict ask). Run detached on the TPU:

    nohup python scripts/probe_webviewer.py auto 1280x720 2 240 > /tmp/probe_web.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from godotoceanwaves_tpu import Ocean
from godotoceanwaves_tpu.utils.webviewer import WebViewer


def main():
    transfer = sys.argv[1] if len(sys.argv) > 1 else "auto"
    width, height = (map(int, sys.argv[2].split("x"))
                     if len(sys.argv) > 2 else (640, 360))
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    fps = float(sys.argv[4]) if len(sys.argv) > 4 else 30.0
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    o = Ocean(map_size=1024, map_dtype="bfloat16", updates_per_second=0)
    # cap 30 default: the tuned render leaves the loop relay-bound, not
    # render-bound; fps=240 measures the true uncapped serving ceiling.
    # argv[5] = frame_batch K (the dispatch-count ablation: K sim+render
    # frames per jitted program, docs/PERF.md "viewer loop round 5")
    v = WebViewer(o, fps=fps, spray=True, transfer=transfer,
                  width=width, height=height, render_scale=scale,
                  frame_batch=batch)
    port = v.start(port=0)
    print("serving on", port, flush=True)

    def state():
        # The very first responses can lag behind cold TPU compiles held
        # under the viewer's ocean lock; retry instead of dying (the A/B
        # measurement is useless if the probe aborts before steady state).
        # Catch-all: a torn response surfaces as HTTPException /
        # JSONDecodeError, not just OSError (advisor round-3), and ANY
        # single failed sample must not abort the 15-minute detached run.
        for _ in range(30):
            try:
                return json.loads(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/state", timeout=60).read())
            except Exception as e:
                print(f"/state retry after {type(e).__name__}: {e}",
                      flush=True)
                time.sleep(5)
        raise RuntimeError("/state never answered")

    deadline = time.time() + 900
    while time.time() < deadline and state()["frame"] < 10:
        time.sleep(10)
    f0, t0 = state()["frame"], time.time()
    time.sleep(60)
    f1, t1 = state()["frame"], time.time()
    s = state()
    frame = b""
    for _ in range(5):
        try:
            frame = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/frame.png", timeout=60).read()
            break
        except Exception as e:
            print(f"/frame.png retry after {type(e).__name__}: {e}",
                  flush=True)
            time.sleep(5)
    print(f"served {(f1 - f0) / (t1 - t0):.2f} frames/s over {t1 - t0:.0f}s; "
          f"sim-thread {s.get('fps', 0.0):.2f} fps / "
          f"{s.get('ms_frame', 0.0):.1f} ms/frame; "
          f"wire format {v._viewport.transfer}, encoded frame "
          f"{len(frame)} B", flush=True)
    v.stop()


if __name__ == "__main__":
    main()
