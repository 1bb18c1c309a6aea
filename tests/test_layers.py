"""Numeric-core tests: golden values + parity vs reference formulas in torch."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from monodepth_tpu import layers


def test_disp_to_depth_golden():
    # depth = 1 / (1/max + (1/min - 1/max) * disp)   (reference layers.py:16-25)
    disp = jnp.asarray([0.0, 0.5, 1.0])
    scaled, depth = layers.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(scaled), [0.01, 5.005, 10.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), [100.0, 1 / 5.005, 0.1], rtol=1e-6)


def test_disp_to_depth_monotone_and_range(rng):
    disp = jnp.asarray(np.sort(rng.random(100, dtype=np.float32)))
    _, depth = layers.disp_to_depth(disp, 0.1, 100.0)
    d = np.asarray(depth)
    assert (np.diff(d) <= 0).all()  # disparity up => depth down
    assert d.min() >= 0.1 - 1e-5 and d.max() <= 100.0 + 1e-4


def test_rot_from_axisangle_identity_and_90deg():
    vec = jnp.zeros((1, 1, 3))
    R = np.asarray(layers.rot_from_axisangle(vec))[0]
    np.testing.assert_allclose(R, np.eye(4), atol=1e-6)

    # 90 deg about z
    vec = jnp.asarray([[[0.0, 0.0, np.pi / 2]]])
    R = np.asarray(layers.rot_from_axisangle(vec))[0]
    want = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    np.testing.assert_allclose(R, want, atol=1e-6)


def test_transformation_invert_roundtrip(rng):
    aa = jnp.asarray(rng.standard_normal((4, 1, 3), dtype=np.float32) * 0.3)
    t = jnp.asarray(rng.standard_normal((4, 3), dtype=np.float32))
    T = np.asarray(layers.transformation_from_parameters(aa, t))
    T_inv = np.asarray(layers.transformation_from_parameters(aa, t, invert=True))
    for i in range(4):
        np.testing.assert_allclose(T[i] @ T_inv[i], np.eye(4), atol=1e-5)


def test_backproject_project_roundtrip(rng):
    b, h, w = 2, 8, 10
    depth = jnp.asarray(rng.random((b, h, w), dtype=np.float32) + 0.5)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 7.0, 7.0, w / 2, h / 2
    Kb = jnp.asarray(np.tile(K[None], (b, 1, 1)))
    inv_Kb = jnp.asarray(np.tile(np.linalg.inv(K)[None], (b, 1, 1)))

    points = layers.backproject_depth(depth, inv_Kb)
    assert points.shape == (b, 4, h * w)
    # Projecting back with identity pose recovers the pixel grid.
    pix = np.asarray(layers.project_3d(points, Kb, jnp.asarray(np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))), h, w))
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    want_x = (xs / (w - 1) - 0.5) * 2
    want_y = (ys / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(pix[0, :, :, 0], want_x, atol=1e-4)
    np.testing.assert_allclose(pix[0, :, :, 1], want_y, atol=1e-4)


def test_smooth_loss_matches_torch(rng):
    disp = rng.random((2, 9, 11, 1), dtype=np.float32)
    img = rng.random((2, 9, 11, 3), dtype=np.float32)
    got = float(layers.get_smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

    d = torch.from_numpy(disp).permute(0, 3, 1, 2)
    i = torch.from_numpy(img).permute(0, 3, 1, 2)
    gdx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
    gdy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    gix = torch.mean(torch.abs(i[:, :, :, :-1] - i[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(i[:, :, :-1, :] - i[:, :, 1:, :]), 1, keepdim=True)
    want = float((gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_loss_zero_for_constant_disp():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.zeros((1, 8, 8, 3))
    assert float(layers.get_smooth_loss(disp, img)) == 0.0


def test_ssim_matches_torch(rng):
    x = rng.random((2, 12, 14, 3), dtype=np.float32)
    y = rng.random((2, 12, 14, 3), dtype=np.float32)
    got = np.asarray(layers.ssim(jnp.asarray(x), jnp.asarray(y)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2)
    refl = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    xp, yp = refl(xt), refl(yt)
    mu_x, mu_y = pool(xp), pool(yp)
    sigma_x = pool(xp**2) - mu_x**2
    sigma_y = pool(yp**2) - mu_y**2
    sigma_xy = pool(xp * yp) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    dd = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    want = torch.clamp((1 - n / dd) / 2, 0, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identical_images_is_zero(rng):
    x = jnp.asarray(rng.random((1, 10, 10, 3), dtype=np.float32))
    out = np.asarray(layers.ssim(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_compute_depth_errors_matches_torch(rng):
    gt = rng.random((50,), dtype=np.float32) * 10 + 0.5
    pred = gt * (1 + rng.standard_normal(50, dtype=np.float32) * 0.1)
    pred = np.abs(pred) + 0.1
    got = [float(v) for v in layers.compute_depth_errors(jnp.asarray(gt), jnp.asarray(pred))]

    g, p = torch.from_numpy(gt), torch.from_numpy(pred)
    thresh = torch.max(g / p, p / g)
    want = [
        float(torch.mean(torch.abs(g - p) / g)),
        float(torch.mean((g - p) ** 2 / g)),
        float(torch.sqrt(((g - p) ** 2).mean())),
        float(torch.sqrt(((torch.log(g) - torch.log(p)) ** 2).mean())),
        float((thresh < 1.25).float().mean()),
        float((thresh < 1.25**2).float().mean()),
        float((thresh < 1.25**3).float().mean()),
    ]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_upsample_shape(rng):
    x = jnp.asarray(rng.random((1, 4, 5, 2), dtype=np.float32))
    assert layers.upsample(x).shape == (1, 8, 10, 2)
