"""Feature detection, description, matching, SE(3) tests."""

import numpy as np
import jax.numpy as jnp

from steroscopic_hardware_tpu.ops import se3
from steroscopic_hardware_tpu.ops.features import (
    detect_and_describe,
    fast_detect,
)
from steroscopic_hardware_tpu.ops.matching import hamming_matrix, match


def _square_grid(h=96, w=128, step=24, half=5):
    """Isolated bright squares on dark background: 4 L-corners each.

    (FAST by design does NOT fire on checkerboard X-crossings — the circle
    splits into alternating short arcs — so L-corners are the right
    fixture.)"""
    img = np.full((h, w), 30, np.uint8)
    centers = []
    margin = 21  # corners must clear the detector's border suppression
    for cy in range(step, h, step):
        for cx in range(step, w, step):
            img[cy - half:cy + half, cx - half:cx + half] = 220
            if margin <= cy <= h - margin and margin <= cx <= w - margin:
                centers.append((cy, cx))
    return img, centers, half


# -- SE3 ---------------------------------------------------------------------

def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(0, 0.5, (20, 6)).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(R, t))
    assert np.allclose(back, xi, atol=1e-4)


def test_se3_compose_inverse(rng):
    xi = rng.normal(0, 0.5, (6,)).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    Ri, ti = se3.inverse(R, t)
    Rc, tc = se3.compose(R, t, Ri, ti)
    assert np.allclose(np.asarray(Rc), np.eye(3), atol=1e-5)
    assert np.allclose(np.asarray(tc), 0, atol=1e-5)


def test_rotation_is_orthonormal(rng):
    phi = rng.normal(0, 2.0, (10, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
    for r in R:
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_project():
    pts = jnp.array([[[0.0, 0.0, 2.0], [1.0, -1.0, 4.0]]])
    uv = np.asarray(se3.project(pts, 100.0, 100.0, 320.0, 240.0))
    assert np.allclose(uv[0, 0], [320, 240])
    assert np.allclose(uv[0, 1], [345, 215])


# -- FAST --------------------------------------------------------------------

def test_fast_finds_square_corners():
    img, centers, half = _square_grid()
    xy, xy_sub, score, valid = fast_detect(img, threshold=20,
                                           max_keypoints=128)
    xy, valid = np.asarray(xy), np.asarray(valid)
    # 12 squares x 4 corners
    assert valid.sum() == 4 * len(centers)
    # every detection sits within 2px of a square corner
    corners = np.array(
        [(cx + sx, cy + sy) for cy, cx in centers
         for sy in (-half, half - 1) for sx in (-half, half - 1)]
    )
    pts = xy[valid]
    d = np.abs(pts[:, None, :] - corners[None]).max(-1).min(1)
    assert (d <= 2).all()


def test_fast_flat_image_has_no_corners():
    img = np.full((64, 64), 128, np.uint8)
    _, _, score, valid = fast_detect(img, threshold=10, max_keypoints=32)
    assert not np.asarray(valid).any()


def test_fast_border_exclusion(rng):
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    xy, _, _, valid = fast_detect(img, threshold=10, max_keypoints=256)
    pts = np.asarray(xy)[np.asarray(valid)]
    if len(pts):
        assert pts.min() >= 16
        assert pts.max() < 64 - 16


# -- ORB + matching ----------------------------------------------------------

def test_descriptors_match_under_translation(rng):
    base = rng.integers(0, 256, (128, 160), dtype=np.uint8)
    # smooth the noise so FAST corners are stable under shift
    img = base
    shift = 8
    img2 = np.roll(img, shift, axis=1)

    fa = detect_and_describe(img, threshold=25, max_keypoints=128)
    fb = detect_and_describe(img2, threshold=25, max_keypoints=128)
    idx_b, good = match(
        fa["desc"], fb["desc"], fa["valid"], fb["valid"],
        ratio=0.9, max_distance=80.0,
    )
    good = np.asarray(good)
    assert good.sum() >= 10
    xa = np.asarray(fa["xy"])[good]
    xb = np.asarray(fb["xy"])[np.asarray(idx_b)[good]]
    dx = xb[:, 0] - xa[:, 0]
    dy = xb[:, 1] - xa[:, 1]
    # majority of matches should recover the translation
    ok = (np.abs(dx - shift) <= 2) & (np.abs(dy) <= 2)
    assert ok.mean() > 0.6


def test_hamming_matrix_exact(rng):
    a = rng.integers(0, 2, (8, 256)).astype(np.uint8)
    b = rng.integers(0, 2, (10, 256)).astype(np.uint8)
    ham = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = (a[:, None, :] != b[None, :, :]).sum(-1)
    assert np.array_equal(ham.astype(int), want)


def test_match_identity_is_perfect(rng):
    d = rng.integers(0, 2, (32, 256)).astype(np.uint8)
    valid = np.ones(32, bool)
    idx, good = match(jnp.asarray(d), jnp.asarray(d),
                      jnp.asarray(valid), jnp.asarray(valid))
    assert np.array_equal(np.asarray(idx), np.arange(32))
    assert np.asarray(good).all()


def test_fast_subpixel_within_half_pixel():
    """Subpixel refinement stays within +-0.5 px of the integer maximum
    and matches it exactly on symmetric corners."""
    img, centers, half = _square_grid()
    xy, xy_sub, score, valid = fast_detect(img, threshold=20,
                                           max_keypoints=128)
    xy, xy_sub, valid = (np.asarray(xy), np.asarray(xy_sub),
                         np.asarray(valid))
    d = np.abs(xy_sub - xy.astype(np.float32))[valid]
    assert (d <= 0.5 + 1e-6).all()


def test_match_batch_variants_bitexact(rng):
    """match_batch / match_one_to_many == per-pair match, bitwise (the
    dispatch-economy forms used by loop closure and the BA window)."""
    import jax.numpy as jnp
    import numpy as np

    from steroscopic_hardware_tpu.ops.matching import (
        match,
        match_batch,
        match_one_to_many,
    )

    K = 64
    descs = rng.integers(0, 2, (4, K, 256)).astype(np.uint8)
    valids = rng.random((4, K)) < 0.8
    q_desc, q_valid = descs[0], valids[0]

    ib, gb = match_batch(jnp.asarray(descs[1:]), jnp.asarray(q_desc),
                         jnp.asarray(valids[1:]), jnp.asarray(q_valid),
                         ratio=0.85, max_distance=60.0)
    io, go = match_one_to_many(
        jnp.asarray(q_desc), jnp.asarray(descs[1:]),
        jnp.asarray(q_valid), jnp.asarray(valids[1:]),
        ratio=0.9, max_distance=80.0)
    for i in range(3):
        ri, rg = match(jnp.asarray(descs[1 + i]), jnp.asarray(q_desc),
                       jnp.asarray(valids[1 + i]), jnp.asarray(q_valid),
                       ratio=0.85, max_distance=60.0)
        np.testing.assert_array_equal(np.asarray(ib[i]), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(gb[i]), np.asarray(rg))
        ri, rg = match(jnp.asarray(q_desc), jnp.asarray(descs[1 + i]),
                       jnp.asarray(q_valid), jnp.asarray(valids[1 + i]),
                       ratio=0.9, max_distance=80.0)
        np.testing.assert_array_equal(np.asarray(io[i]), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(go[i]), np.asarray(rg))
