"""Utility subsystem tests: metrics, logging, image IO, multihost shims."""
import json
import logging
import time

import numpy as np
import pytest

from weekend_raytracer_tpu.utils.image import _save_png_pure, save_png, save_ppm
from weekend_raytracer_tpu.utils.log import JsonFormatter, get_logger, log_event
from weekend_raytracer_tpu.utils.metrics import FpsCounter, StepTimer, profiler_trace


def test_fps_counter_window():
    """8-frame sliding window (reference main.rs:484-513)."""
    f = FpsCounter(window=8)
    assert f.average_fps() == 0.0
    for _ in range(20):
        f.update(0.02)  # 50 fps
    assert f.average_fps() == pytest.approx(50.0, rel=1e-6)
    f.update(0.1)  # one slow frame enters the window
    assert 30.0 < f.average_fps() < 50.0


def test_step_timer_throughput():
    t = StepTimer(rays_per_step=1000)
    with t.step():
        time.sleep(0.01)
    with t.step():
        time.sleep(0.02)
    assert t.total_seconds >= 0.03
    assert t.best_rays_per_sec >= t.mean_rays_per_sec > 0


def test_profiler_trace_noop():
    with profiler_trace(None):
        pass  # must be a harmless no-op without a log dir


def test_json_log_fields(capsys):
    rec = logging.LogRecord("weekend_raytracer_tpu.x", logging.INFO, "f", 1,
                            "hello %s", ("world",), None)
    rec.fields = {"rays": 42}
    line = JsonFormatter().format(rec)
    data = json.loads(line)
    assert data["msg"] == "hello world"
    assert data["rays"] == 42
    assert data["level"] == "info"


def test_get_logger_singleton_handler():
    a = get_logger("one")
    b = get_logger("two")
    root = logging.getLogger("weekend_raytracer_tpu")
    assert len(root.handlers) == 1
    log_event(a, "evt", x=1)  # must not raise


def test_pure_png_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = (rs.rand(12, 9, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    _save_png_pure(p, img)
    from PIL import Image

    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_save_ppm(tmp_path):
    img = np.zeros((4, 5, 3), dtype=np.uint8)
    img[1, 2] = [255, 128, 0]
    p = str(tmp_path / "x.ppm")
    save_ppm(p, img)
    data = open(p, "rb").read()
    assert data.startswith(b"P6\n5 4\n255\n")


def test_multihost_single_process():
    import jax

    from weekend_raytracer_tpu.parallel import multihost

    multihost.initialize(num_processes=1)  # no-op path
    mesh = multihost.global_mesh()
    assert mesh.shape["tiles"] * mesh.shape["spp"] == len(jax.devices())
    import jax.numpy as jnp

    acc = jnp.ones((6 * 4, 3), jnp.float32)
    out = multihost.gather_frame(acc, width=6, height=4)
    assert out is not None and out.shape == (24, 3)
