"""ShardedInference + visualize_mesh + mapper 4-panel tests."""

import numpy as np
import pytest

import jax

from monodepth_tpu.parallel.inference import ShardedInference
from monodepth_tpu.parallel.mesh import create_mesh


def test_sharded_inference_matches_plain(rng):
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything()
    x = rng.random((4, 48, 64, 3), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    want = np.asarray(model.apply(variables, x, 1.0)[("disp", 0)])

    sharded = ShardedInference(model, variables,
                               mesh=create_mesh(jax.devices()[:8], model=2))
    got = sharded(x)  # batch 4 on data=4 mesh
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sharded_inference_ragged_batch(rng):
    from monodepth_tpu.models import DepthAnything

    model = DepthAnything()
    x = rng.random((3, 48, 64, 3), dtype=np.float32)  # 3 not divisible by 8
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    sharded = ShardedInference(model, variables,
                               mesh=create_mesh(jax.devices()[:8]))
    out = sharded(x, np.asarray([1.0, 0.5, 0.01]))
    assert out.shape == (3, 48, 64, 1)
    # per-sample scales held through padding
    out_unit = sharded(x, np.asarray([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(out[2], out_unit[2] * 0.01, rtol=1e-4)


def test_visualize_mesh(tmp_path, rng):
    from monodepth_tpu.utils.terrain import TerrainReconstructor
    from monodepth_tpu.utils.visualization import MarsTerrainVisualizer

    recon = TerrainReconstructor()
    depth = np.full((12, 12), 4.0, dtype=np.float32) + rng.random((12, 12))
    mesh = recon.grid_mesh_from_depth(depth)
    p = MarsTerrainVisualizer().visualize_mesh(mesh, save_path=str(tmp_path / "m.png"))
    import os

    assert os.path.getsize(p) > 0


def test_mapper_4panel_visualization(tmp_path, rng):
    from monodepth_tpu.config import ModelConfig
    from monodepth_tpu.inference import MarsDepthEstimator
    from monodepth_tpu.utils.terrain import MarsTerrainMapper

    est = MarsDepthEstimator(ModelConfig(pretrained=False))
    mapper = MarsTerrainMapper(estimator=est)
    img = rng.random((48, 64, 3), dtype=np.float32)
    depth, path = mapper.process_image_with_visualization(
        img, str(tmp_path / "panel.png"), {"source": "rover"}
    )
    import os

    assert depth.shape == (48, 64)
    assert os.path.getsize(path) > 0
