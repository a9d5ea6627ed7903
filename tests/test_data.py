"""PSG dataset reader + pipeline tests on the synthetic fixture."""

import numpy as np
import pytest

from pairnet_tpu.data.pipeline import Loader, PipelineConfig, preprocess_sample
from pairnet_tpu.data.psg import PSGDataset, id2rgb, rgb2id
from pairnet_tpu.data.synthetic import PREDICATES, THING_CLASSES, make_synthetic_psg


@pytest.fixture(scope="module")
def psg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("psg")
    make_synthetic_psg(str(root), num_images=8, num_test=3, seed=1)
    return str(root)


def test_rgb2id_roundtrip():
    ids = np.asarray([[0, 1, 255], [256, 65536, 70000]], np.int64)
    assert (rgb2id(id2rgb(ids)) == ids).all()


def test_split_and_indexing(psg_root):
    train = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    test = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="test")
    assert len(train) == 5 and len(test) == 3
    assert train.CLASSES[: len(THING_CLASSES)] == THING_CLASSES
    assert train.PREDICATES == PREDICATES
    # predicates are 1-indexed after load
    for ds in (train, test):
        for d in ds.data:
            assert (d.relations[:, 2] >= 1).all()
            assert (d.relations[:, 2] <= len(PREDICATES)).all()


def test_relation_dedup_train_vs_test(psg_root):
    train = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    # inject duplicate pair with two predicates
    train.data[0].relations = np.asarray(
        [[0, 1, 2], [0, 1, 3], [0, 1, 2], [1, 0, 4]], np.int32
    )
    ann = train.get_ann_info(0)
    pairs = {(int(s), int(o)) for s, o, _ in ann["rels"]}
    assert pairs == {(0, 1), (1, 0)}  # one predicate per pair in train

    test = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="test")
    test.data[0].relations = np.asarray(
        [[0, 1, 2], [0, 1, 3], [0, 1, 2], [1, 0, 4]], np.int32
    )
    ann = test.get_ann_info(0)
    trips = {tuple(map(int, r)) for r in ann["rels"]}
    assert trips == {(0, 1, 2), (0, 1, 3), (1, 0, 4)}  # multi-label kept


def test_masks_decode(psg_root):
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    masks, labels, semantic = ds.load_masks(0)
    assert masks.shape[0] == len(ds.data[0].segments_info)
    # masks partition the image (synthetic data has full coverage)
    assert (masks.sum(0) == 1).all()
    assert (semantic != 255).all()


def test_pipeline_fixed_shapes(psg_root):
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    cfg = PipelineConfig(
        target_size=(96, 128), size_divisor=32, max_inst=8, max_rels=10
    )
    s = preprocess_sample(ds, 0, cfg, train=True, rng=np.random.default_rng(0))
    assert s["image"].shape == (96, 128, 3)
    assert s["gt_masks"].shape == (8, 24, 32)
    assert s["gt_rels"].shape == (10, 3)
    assert s["gt_valid"].sum() == len(ds.data[0].segments_info)
    # relations point at valid instances with 1-based predicates
    r = s["gt_rels"][s["rel_valid"]]
    assert (r[:, :2] < s["gt_valid"].sum()).all()
    assert (r[:, 2] >= 1).all()


def test_loader_batches(psg_root):
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    cfg = PipelineConfig(target_size=(96, 128), max_inst=8, max_rels=10)
    loader = Loader(ds, cfg, batch_size=2, train=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 5 images, drop_last
    for b in batches:
        assert b["image"].shape == (2, 96, 128, 3)
        assert b["gt_labels"].shape == (2, 8)
        assert b["batch_valid"].all()


def test_freq_matrix(psg_root):
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    freq = ds.get_freq_matrix()
    assert freq.shape == (7, 7, len(PREDICATES) + 1)
    total_rels = sum(len(d.relations) for d in ds.data)
    assert freq.sum() == total_rels
    stats = ds.get_statistics()
    assert np.isfinite(stats["pred_dist"]).all()


def test_autoaugment_crop_branch(psg_root):
    """crop_prob=1 routes every train sample through RelRandomCrop (ref:
    configs/mask2former/pairnet.py:245-298) with re-indexed relations."""
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    cfg = PipelineConfig(
        target_size=(96, 128), size_divisor=32, max_inst=8, max_rels=10,
        crop_prob=1.0, crop_scales=(64, 80), crop_size_range=(24, 48),
        flip_prob=0.0,
    )
    rng = np.random.default_rng(3)
    got_fewer = False
    for i in list(range(len(ds))) * 4:
        s = preprocess_sample(ds, i, cfg, train=True, rng=rng)
        assert s["image"].shape == (96, 128, 3)  # fixed shapes preserved
        n = int(s["gt_valid"].sum())
        assert n >= 1
        r = s["gt_rels"][s["rel_valid"]]
        assert len(r) >= 1  # RelRandomCrop never leaves zero triplets
        assert (r[:, :2] < n).all()  # re-indexed into surviving instances
        assert (r[:, 2] >= 1).all()
        got_fewer = got_fewer or n < len(ds.data[i].segments_info)
    assert got_fewer  # at least one crop actually dropped an instance


def test_async_loader_matches_sync(psg_root):
    """Thread-pool loader yields identical batches to the sync path when
    augmentation is off (per-sample rng only drives train-time aug)."""
    ds = PSGDataset(f"{psg_root}/psg.json", data_root=psg_root, split="train")
    cfg = PipelineConfig(
        target_size=(96, 128), max_inst=8, max_rels=10, flip_prob=0.0
    )
    sync = list(Loader(ds, cfg, 2, train=False, num_workers=0))
    asyn = list(Loader(ds, cfg, 2, train=False, num_workers=4))
    assert len(sync) == len(asyn) == 3  # 5 images, no drop_last
    for a, b in zip(sync, asyn):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
