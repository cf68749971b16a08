"""Checkpoint / resume subsystem tests."""
import os

import numpy as np
import pytest

from obia_tpu.checkpoint import TileManifest, load_pytree, save_pytree
from obia_tpu.classification.mlp import FlaxMLPClassifier


def test_pytree_roundtrip(tmp_path):
    tree = {"a": np.arange(5.0), "b": {"c": np.ones((2, 3), np.float32)}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    back = load_pytree(path, like=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), tree["b"]["c"])


def test_tile_manifest(tmp_path):
    path = str(tmp_path / "manifest.json")
    m = TileManifest(path)
    assert not m.is_done("t1")
    m.mark("t1", "done", n_segments=5)
    m.mark("t2", "failed", error="boom")
    # reload from disk
    m2 = TileManifest(path)
    assert m2.is_done("t1")
    assert m2.failed() == ["t2"]
    assert m2.pending(["t1", "t2", "t3"]) == ["t2", "t3"]


def test_mlp_save_load(tmp_path, rng):
    X = rng.normal(size=(200, 4)).astype(np.float32)
    y = np.where(X[:, 0] > 0, "x", "y")
    clf = FlaxMLPClassifier(hidden_layer_sizes=(8,), max_iter=30)
    clf.fit(X, y)
    p1 = clf.predict_proba(X[:10])
    path = str(tmp_path / "mlp")
    clf.save(path)
    clf2 = FlaxMLPClassifier().load(path)
    p2 = clf2.predict_proba(X[:10])
    np.testing.assert_allclose(p1, p2, atol=1e-6)
    assert list(clf2.classes_) == list(clf.classes_)


def test_tiled_resume(tmp_path, rng):
    """create_tiled_segments resume=True reuses cached tiles."""
    from obia_tpu.geometry import Affine
    from obia_tpu.io.tiff import write_tiff
    from obia_tpu.utils.tiling import create_tiled_segments

    h, w = 120, 120
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "scene.tif")
    write_tiff(path, arr, transform=Affine(1, 0, 0, 0, -1, h),
               crs="EPSG:32633")
    out_dir = str(tmp_path / "out")
    g1 = create_tiled_segments(path, out_dir, tile_size=60, buffer=10,
                               n_segments=8)
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))
    import json
    mani = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert all(v["status"] == "done" for v in mani.values())
    g2 = create_tiled_segments(path, out_dir, tile_size=60, buffer=10,
                               n_segments=8, resume=True)
    assert len(g1) == len(g2)


def test_npz_fallback_honors_like_and_cleans_partial_dir(tmp_path,
                                                         monkeypatch):
    """When orbax save fails midway, the partial directory must not shadow
    the .npz fallback, and load(like=...) must restore tuple structure and
    dtypes from the template instead of returning string-keyed dicts."""
    import orbax.checkpoint as ocp

    from obia_tpu.checkpoint import load_pytree, save_pytree

    class Boom:
        def save(self, path, tree, force=True):
            os.makedirs(path, exist_ok=True)  # partial dir left behind
            raise IOError("disk full (simulated)")

    monkeypatch.setattr(ocp, "StandardCheckpointer", Boom)
    tree = ({"w": np.arange(4, dtype=np.float32)},
            {"m": np.ones(2, np.float64)})
    path = str(tmp_path / "ckpt")
    with pytest.warns(UserWarning, match="falling back"):
        save_pytree(path, tree)
    assert not os.path.isdir(path)          # partial dir removed
    assert os.path.exists(path + ".npz")    # fallback written
    got = load_pytree(path, like=tree)
    assert isinstance(got, tuple) and len(got) == 2
    np.testing.assert_array_equal(got[0]["w"], tree[0]["w"])
    assert got[1]["m"].dtype == np.float64
    # without `like`, the legacy dict form is preserved
    legacy = load_pytree(path)
    np.testing.assert_array_equal(legacy["0"]["w"], tree[0]["w"])
