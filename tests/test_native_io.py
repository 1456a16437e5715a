"""Native C++ IO library vs NumPy reference."""

import numpy as np
import pytest

from vlgae_tpu.data import native_io
from vlgae_tpu.data.features import DetFeatureLoader, save_npy_features


@pytest.fixture(scope="module")
def lib():
    lib = native_io.load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_npy_header(tmp_path, lib):
    arr = np.random.default_rng(0).standard_normal((13, 20)).astype(np.float32)
    np.save(tmp_path / "a.npy", arr)
    assert native_io.npy_shape(tmp_path / "a.npy") == (13, 20)
    arr64 = arr.astype(np.float64)
    np.save(tmp_path / "b.npy", arr64)
    assert native_io.npy_shape(tmp_path / "b.npy") == (13, 20)


def test_batch_load_matches_numpy(tmp_path, lib):
    rng = np.random.default_rng(1)
    feat_dim, n_box = 16, 9
    paths = []
    raws = []
    for i in range(4):
        raw = rng.standard_normal((n_box, feat_dim + 4)).astype(np.float32)
        save_npy_features(tmp_path, 100 + i, raw)
        paths.append(tmp_path / f"{100 + i}.npy")
        raws.append(raw)
    feats, boxes, mask = native_io.load_det_feats_batch(
        paths, pad_boxes=12, feat_dim=feat_dim, sample=0
    )
    assert feats.shape == (4, 12, feat_dim)
    for i, raw in enumerate(raws):
        np.testing.assert_allclose(feats[i, :n_box], raw[:, :feat_dim],
                                   rtol=1e-6)
        np.testing.assert_allclose(boxes[i, :n_box], raw[:, feat_dim:],
                                   rtol=1e-6)
        assert mask[i, :n_box].all() and not mask[i, n_box:].any()


def test_sampling_without_replacement(tmp_path, lib):
    rng = np.random.default_rng(2)
    feat_dim, n_box = 8, 20
    raw = rng.standard_normal((n_box, feat_dim + 4)).astype(np.float32)
    # make rows identifiable via first feature value
    raw[:, 0] = np.arange(n_box)
    save_npy_features(tmp_path, 7, raw)
    feats, boxes, mask = native_io.load_det_feats_batch(
        [tmp_path / "7.npy"], pad_boxes=10, feat_dim=feat_dim, sample=5,
        seed=3,
    )
    ids = feats[0, :5, 0].astype(int)
    assert len(set(ids.tolist())) == 5  # no replacement
    assert mask[0, :5].all() and not mask[0, 5:].any()


def test_loader_uses_native(tmp_path, lib):
    rng = np.random.default_rng(3)
    for i in range(3):
        save_npy_features(
            tmp_path, 50 + i,
            rng.standard_normal((6, 12)).astype(np.float32),
        )
    loader = DetFeatureLoader(tmp_path, sample=0, pad_boxes=8)
    out = loader([50, 51, 52])
    assert out["vis_box_feat"].shape == (3, 8, 8)
    assert out["vis_box_mask"][:, :6].all()
