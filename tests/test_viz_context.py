"""Headless VizContext (reference lib/viztools/viz_o3d_utils.py:34-216).

The reference context is an Open3D window; ours must provide the same
surface headless: scene upserts, turntable step() frames via the painter
rasteriser, key callbacks, reset/condition semantics.
"""

import numpy as np
import pytest

from poem_v2_tpu.viztools import VizContext

TETRA_V = np.array(
    [[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.0], [0.0, 0.0, 0.1]]
)
TETRA_F = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])


def make_ctx(**kw):
    ctx = VizContext(backend="headless", image_size=128, **kw)
    ctx.init(point_size=6.0)
    return ctx


def test_mesh_and_pc_render_nonempty_frames():
    ctx = make_ctx()
    ctx.update_by_mesh("hand", TETRA_V, TETRA_F, vcolors="red")
    rng = np.random.RandomState(0)
    ctx.update_by_pc("bps", rng.uniform(-0.05, 0.15, (64, 3)), pcolors=(0, 255, 0))
    ctx.step()
    ctx.step()
    assert len(ctx.frames) == 2
    for frame in ctx.frames:
        assert frame.shape == (128, 128, 3) and frame.dtype == np.uint8
        # something was drawn over the white background
        assert (frame < 250).any()
    # turntable: successive frames differ
    assert (ctx.frames[0] != ctx.frames[1]).any()


def test_update_replaces_geometry_and_remove_clears():
    ctx = make_ctx()
    ctx.update_by_mesh("m", TETRA_V, TETRA_F)
    moved = TETRA_V + 1.0
    ctx.update_by_mesh("m", moved, TETRA_F)
    assert np.allclose(ctx.geometry_to_viz["m"]["verts"], moved)
    # update=False on an existing key is a no-op (reference semantics)
    ctx.update_by_mesh("m", TETRA_V, TETRA_F, update=False)
    assert np.allclose(ctx.geometry_to_viz["m"]["verts"], moved)
    ctx.remove_all_geometry()
    assert not ctx.geometry_to_viz
    assert (ctx.snapshot() == 255).all()


def test_color_forms():
    ctx = make_ctx()
    pts = np.zeros((5, 3))
    assert ctx.paint_color_on(pts).shape == (5, 3)  # default grey
    assert np.allclose(ctx.paint_color_on(pts, "blue")[0], [0, 0, 1])
    assert np.allclose(ctx.paint_color_on(pts, (255, 0, 0))[0], [1, 0, 0])
    per_pt = np.linspace(0, 1, 15).reshape(5, 3)
    assert np.allclose(ctx.paint_color_on(pts, per_pt), per_pt)
    with pytest.raises(ValueError):
        ctx.paint_color_on(pts, np.zeros((7, 3)))


def test_key_callback_and_condition():
    ctx = make_ctx(non_block=False)
    assert ctx.condition()
    hits = []
    ctx.register_key_callback("A", lambda v: hits.append(1))
    ctx.trigger_key("a")
    assert hits == [1]
    ctx.trigger_key("Q")  # reference: Q shuts the loop down
    assert not ctx.running and not ctx.condition()
    ctx.reset()
    assert ctx.condition()
    # non_block contexts never loop (reference viz_o3d_utils.py:216)
    assert not VizContext(backend="headless", non_block=True).condition()


def test_run_turntable_and_save_dir(tmp_path):
    ctx = VizContext(backend="headless", image_size=96, save_dir=str(tmp_path))
    ctx.init()
    ctx.update_by_mesh("m", TETRA_V, TETRA_F, vcolors=np.array([0.2, 0.6, 0.9]))
    ctx.run(n_steps=3)
    assert len(ctx.frames) == 3
    assert len(list(tmp_path.glob("frame_*.png"))) == 3
    ctx.deinit()
