"""Quickshift invariants + naive-oracle agreement on a tiny image."""
import numpy as np
import pytest

from obia_tpu.ops.quickshift import quickshift


def naive_quickshift(image, ratio, kernel_size, max_dist, density_noise):
    """Direct per-pixel implementation of the documented semantics."""
    h, w, c = image.shape
    scaled = image.astype(np.float64) * ratio
    rd = max(1, int(np.ceil(3 * kernel_size)))
    rho = np.ones((h, w))
    for r in range(h):
        for cc in range(w):
            for dy in range(-rd, rd + 1):
                for dx in range(-rd, rd + 1):
                    if dy == 0 and dx == 0:
                        continue
                    r2, c2 = r + dy, cc + dx
                    if not (0 <= r2 < h and 0 <= c2 < w):
                        continue
                    d2 = ((scaled[r, cc] - scaled[r2, c2]) ** 2).sum() \
                        + dy * dy + dx * dx
                    rho[r, cc] += np.exp(-d2 / (2 * kernel_size ** 2))
    rho = rho + density_noise
    rp = max(1, int(np.ceil(max_dist)))
    parent = np.arange(h * w).reshape(h, w)
    for r in range(h):
        for cc in range(w):
            best = np.inf
            for dy in range(-rp, rp + 1):
                for dx in range(-rp, rp + 1):
                    if dy == 0 and dx == 0:
                        continue
                    r2, c2 = r + dy, cc + dx
                    if not (0 <= r2 < h and 0 <= c2 < w):
                        continue
                    if rho[r2, c2] <= rho[r, cc]:
                        continue
                    d2 = ((scaled[r, cc] - scaled[r2, c2]) ** 2).sum() \
                        + dy * dy + dx * dx
                    if d2 <= max_dist ** 2 and d2 < best:
                        best = d2
                        parent[r, cc] = r2 * w + c2
    flat = parent.reshape(-1)
    for _ in range(h * w):
        nxt = flat[flat]
        if (nxt == flat).all():
            break
        flat = nxt
    _, inv = np.unique(flat, return_inverse=True)
    return inv.reshape(h, w)


def test_quickshift_matches_naive(rng):
    img = rng.random((18, 22, 2)).astype(np.float32)
    # disable tie-break noise influence by regenerating it identically
    import jax
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                         (18, 22)) * 1e-5)
    got = quickshift(img, ratio=1.0, kernel_size=2.0, max_dist=4.0,
                     random_seed=3)
    want = naive_quickshift(np.asarray(img, np.float64), 1.0, 2.0, 4.0, noise)
    # same partition
    assert got.shape == want.shape
    # compare partitions via co-label agreement on sampled pairs
    flat_g, flat_w = got.ravel(), want.ravel()
    idx = rng.integers(0, flat_g.size, size=(2000, 2))
    same_g = flat_g[idx[:, 0]] == flat_g[idx[:, 1]]
    same_w = flat_w[idx[:, 0]] == flat_w[idx[:, 1]]
    agreement = (same_g == same_w).mean()
    assert agreement > 0.99, agreement


def test_quickshift_segments_structure(small_rgb):
    labels = quickshift(small_rgb, kernel_size=3, max_dist=8, ratio=1.0)
    assert labels.min() == 0
    n = labels.max() + 1
    assert 4 <= n <= small_rgb.shape[0] * small_rgb.shape[1] // 16
    # deterministic
    labels2 = quickshift(small_rgb, kernel_size=3, max_dist=8, ratio=1.0)
    np.testing.assert_array_equal(labels, labels2)


def test_quickshift_in_create_segments(small_rgb):
    from obia_tpu.geometry import Affine
    from obia_tpu.handlers.geotif import image_from_array
    from obia_tpu.segmentation.segment_boundaries import create_segments
    img = image_from_array(small_rgb, Affine(1, 0, 0, 0, -1, 96), crs=32633)
    gdf = create_segments(img, method="quickshift", kernel_size=3, max_dist=6)
    assert len(gdf) > 3
    total = sum(g.area for g in gdf.geometry)
    assert abs(total - small_rgb.shape[0] * small_rgb.shape[1]) < 1e-6
    with pytest.raises(TypeError):
        create_segments(img, method="quickshift", mask=np.ones((96, 128)))


def test_quickshift_return_tree(small_rgb):
    from obia_tpu.ops.quickshift import quickshift
    out = quickshift(small_rgb[:48, :64], kernel_size=3, max_dist=6.0,
                     return_tree=True)
    labels, parent, dist = out
    H, W = 48, 64
    assert labels.shape == (H, W) and parent.shape == (H, W)
    assert dist.shape == (H, W)
    # roots point to themselves and have infinite parent distance
    lin = np.arange(H * W).reshape(H, W)
    roots = parent == lin
    assert roots.any()
    assert np.isinf(dist[roots]).all()
    # non-root parents are valid linear indices whose pixel has a label
    pr = parent[~roots]
    assert ((pr >= 0) & (pr < H * W)).all()
    # flattening the returned tree reproduces the labels' partition
    p = parent.reshape(-1).copy()
    for _ in range(20):
        p = p[p]
    flat_roots = np.unique(p)
    assert len(flat_roots) == len(np.unique(labels))


def test_quickshift_uint8_matches_scaled_float(rng):
    """skimage runs img_as_float first: uint8 input must segment like its
    /255 float copy (raw 0-255 values fed to the Lab conversion used to
    clip to near-constant white)."""
    from obia_tpu.ops.quickshift import quickshift

    img8 = (rng.random((40, 44, 3)) * 255).astype(np.uint8)
    a = quickshift(img8, kernel_size=2, max_dist=6, rng=0)
    b = quickshift(img8.astype(np.float32) / 255.0, kernel_size=2,
                   max_dist=6, rng=0)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) > 1  # not one giant white segment


def test_quickshift_labels_first_occurrence_order(rng):
    """Labels are compacted in raster (first-occurrence) order, as the
    docstring promises."""
    from obia_tpu.ops.quickshift import quickshift

    img = rng.random((36, 40, 3)).astype(np.float32)
    lab = quickshift(img, kernel_size=2, max_dist=8, rng=0,
                     convert2lab=False)
    flat = lab.reshape(-1)
    first = {}
    for i, v in enumerate(flat):
        first.setdefault(int(v), i)
    order = [k for k, _ in sorted(first.items(), key=lambda kv: kv[1])]
    assert order == sorted(order)  # first occurrences appear in id order
