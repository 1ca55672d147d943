"""Preview server tests: drive the HTTP surface like a browser would
(frame fetch, stats, orbit drag, mode switch)."""

import json
import textwrap
import time
import urllib.request

import numpy as np
import pytest

from pathtracer_tpu.integrator.render import Renderer
from pathtracer_tpu.preview.server import start_preview_thread
from pathtracer_tpu.utils.config import RenderOptions, SampleMode

SCENE = """
MATERIAL light
TYPE\tLight
ALBEDO      5 5 5
METALLIC    0
ROUGHNESS   0
IOR         0

MATERIAL white
TYPE\tLambertian
ALBEDO      .8 .8 .8
METALLIC    0
ROUGHNESS   0
IOR         0

CAMERA
RES         32 32
FOVY        45
ITERATIONS  100000
DEPTH       3
FILE        preview
EYE         0 1 5
LOOKAT      0 1 0
UP          0 1 0

OBJECT floor
cube
material white
TRANS       0 0 0
ROTAT       0 0 0
SCALE       8 .01 8

OBJECT lamp
sphere
material light
TRANS       0 3 0
ROTAT       0 0 0
SCALE       1 1 1
"""


@pytest.fixture()
def preview(tmp_path):
    scene = tmp_path / "p.txt"
    scene.write_text(textwrap.dedent(SCENE))
    r = Renderer(scene, opts=RenderOptions(sample_mode=SampleMode.MIS))
    state, server, thread = start_preview_thread(r, port=0, chunk=1)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield state, base
    state.running = False
    server.shutdown()


def get(base, path, timeout=30):
    return urllib.request.urlopen(base + path, timeout=timeout)


class TestPreviewServer:
    def test_page_and_frame(self, preview):
        state, base = preview
        page = get(base, "/").read()
        assert b"pathtracer_tpu" in page
        deadline = time.time() + 60
        png = b""
        while time.time() < deadline:
            png = get(base, "/frame.png").read()
            if png.startswith(b"\x89PNG"):
                break
            time.sleep(0.5)
        assert png.startswith(b"\x89PNG")

    def test_stats_progress(self, preview):
        state, base = preview
        deadline = time.time() + 60
        it = 0
        while time.time() < deadline:
            stats = json.loads(get(base, "/stats.json").read() or b"{}")
            it = stats.get("iteration", 0)
            if it >= 2:
                break
            time.sleep(0.5)
        assert it >= 2
        assert stats["mode"] == "MIS"
        assert stats["resolution"] == "32x32"

    def test_orbit_resets_accumulation(self, preview):
        state, base = preview
        time.sleep(2)
        get(base, "/orbit?dtheta=10&dphi=-15").read()
        # observe the camera change (the loop applies pending orbits between
        # iterations; iteration count restarts but advances again quickly,
        # so assert on the pose + that accumulation went DOWN at some point)
        before = state.renderer.iteration
        deadline = time.time() + 60
        theta_ok = False
        dropped = False
        while time.time() < deadline:
            r = state.renderer
            if abs(r.camera.theta - 10.0) < 1e-3:
                theta_ok = True
            if r.iteration < before:
                dropped = True
            if theta_ok and dropped:
                break
            time.sleep(0.05)
        assert theta_ok, "orbit should change theta"
        assert dropped, "orbit should reset accumulation"

    def test_mode_switch(self, preview):
        state, base = preview
        get(base, "/mode?m=0").read()
        deadline = time.time() + 60
        while time.time() < deadline:
            stats = json.loads(get(base, "/stats.json").read() or b"{}")
            if stats.get("mode") == "BSDF":
                break
            time.sleep(0.5)
        assert stats["mode"] == "BSDF"
