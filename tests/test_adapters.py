"""Per-dataset SDK adapters: fabricated mini data-roots exercise each
reader's layout parsing, getters, and multiview grouping."""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
yaml = pytest.importorskip("yaml")


def _write_img(path, size=(32, 32)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = (np.random.RandomState(0).rand(size[1], size[0], 3) * 255).astype(np.uint8)
    cv2.imwrite(path, img)


def _rand_joints(rs, z=0.5):
    j = rs.randn(21, 3).astype(np.float32) * 0.02
    j[:, 2] += z
    return j


# --------------------------------------------------------------------------
# FreiHAND
# --------------------------------------------------------------------------
def make_freihand_root(root, n=3):
    rs = np.random.RandomState(0)
    d = os.path.join(root, "FreiHAND")
    K = [[[200.0, 0, 16], [0, 200.0, 16], [0, 0, 1]]] * n
    xyz = [_rand_joints(rs).tolist() for _ in range(n)]
    verts = [(rs.randn(778, 3) * 0.02 + [0, 0, 0.5]).tolist() for _ in range(n)]
    mano = [rs.randn(1, 61).tolist() for _ in range(n)]
    os.makedirs(d, exist_ok=True)
    for tag, data in [("K", K), ("xyz", xyz), ("verts", verts), ("mano", mano),
                      ("scale", [1.0] * n)]:
        with open(os.path.join(d, f"training_{tag}.json"), "w") as f:
            json.dump(data, f)
    for i in range(2 * n):  # uniques + one recolored replica set
        _write_img(os.path.join(d, "training", "rgb", "%08d.jpg" % i))
    return root


def test_freihand_adapter(tmp_path):
    from poem_v2_tpu.data.adapters import FreiHAND

    ds = FreiHAND(make_freihand_root(str(tmp_path)), "train")
    assert len(ds) == 6  # replicas included
    assert ds.get_joints_3d(0).shape == (21, 3)
    # replica shares unique labels
    np.testing.assert_allclose(ds.get_joints_3d(3), ds.get_joints_3d(0))
    assert ds.get_verts_3d(1).shape == (778, 3)
    assert ds.get_mano_pose(2).shape == (48,)
    assert ds.get_image(0).shape == (32, 32, 3)
    j2d = ds.get_joints_2d(0)
    assert np.isfinite(j2d).all()
    label = ds.get_label(0)
    assert label["cam_intr"].shape == (3, 3)


# --------------------------------------------------------------------------
# DexYCB
# --------------------------------------------------------------------------
def make_dexycb_root(root, serials=("840412060917", "932122060857"), frames=2):
    rs = np.random.RandomState(1)
    d = os.path.join(root, "DexYCB")
    seq = "20200709-subject-01/20200709_141754"
    cal = os.path.join(d, "calibration")
    os.makedirs(os.path.join(d, seq), exist_ok=True)
    with open(os.path.join(d, seq, "meta.yml"), "w") as f:
        yaml.safe_dump(
            {"serials": list(serials), "num_frames": frames,
             "extrinsics": "ext0", "mano_calib": ["subj01"],
             "mano_sides": ["right"]}, f)
    extr = {}
    for k, s in enumerate(serials):
        m = np.eye(3, 4)
        m[0, 3] = 0.1 * k
        extr[s] = m.flatten().tolist()
        os.makedirs(os.path.join(cal, "intrinsics"), exist_ok=True)
        with open(os.path.join(cal, "intrinsics", f"{s}_640x480.yml"), "w") as f:
            yaml.safe_dump({"color": {"fx": 600.0, "fy": 600.0, "ppx": 320.0, "ppy": 240.0}}, f)
    os.makedirs(os.path.join(cal, "extrinsics_ext0"), exist_ok=True)
    with open(os.path.join(cal, "extrinsics_ext0", "extrinsics.yml"), "w") as f:
        yaml.safe_dump({"extrinsics": extr}, f)
    os.makedirs(os.path.join(cal, "mano_subj01"), exist_ok=True)
    with open(os.path.join(cal, "mano_subj01", "mano.yml"), "w") as f:
        yaml.safe_dump({"betas": rs.randn(10).tolist()}, f)
    for s in serials:
        os.makedirs(os.path.join(d, seq, s), exist_ok=True)
        for fr in range(frames):
            np.savez(
                os.path.join(d, seq, s, f"labels_{fr:06d}.npz"),
                joint_3d=_rand_joints(rs)[None],
                joint_2d=(rs.rand(1, 21, 2) * 32).astype(np.float32),
                pose_m=rs.randn(1, 51).astype(np.float32) * 0.1,
            )
            _write_img(os.path.join(d, seq, s, f"color_{fr:06d}.jpg"))
    return root


def test_dexycb_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import DexYCB, DexYCBMultiView
    from poem_v2_tpu.data.adapters.dexycb import CONSTANT_CAM_SERIAL

    root = make_dexycb_root(str(tmp_path))
    ds = DexYCB(root, sequences=["20200709-subject-01/20200709_141754"])
    assert len(ds) == 4  # 2 serials x 2 frames
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_cam_intr(0)[0, 0] == 600.0
    assert ds.get_verts_3d(0).shape == (778, 3)
    assert ds.get_mano_shape(0).shape == (10,)

    mv = DexYCBMultiView(ds, master_system="as_constant_camera")
    assert len(mv) == 2  # frames
    views = mv.views_of(0)
    assert ds.samples[views[0]][1] == CONSTANT_CAM_SERIAL
    item = mv[0]
    assert len(item["images"]) == 2
    # master extr is identity after re-basing
    np.testing.assert_allclose(item["label"]["cam_extr"][0], np.eye(4), atol=1e-6)
    assert not np.allclose(item["label"]["cam_extr"][1], np.eye(4))


# --------------------------------------------------------------------------
# HO3D
# --------------------------------------------------------------------------
def make_ho3d_root(root, frames=2):
    rs = np.random.RandomState(2)
    d = os.path.join(root, "HO3D_v3")
    lines = []
    for seq in ["ABF10", "ABF11"]:
        for fr in range(frames):
            fid = f"{fr:04d}"
            lines.append(f"{seq}/{fid}")
            meta = {
                "camMat": np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]),
                "handJoints3D": _rand_joints(rs) * [1, -1, -1],
                "handPose": rs.randn(48).astype(np.float32) * 0.1,
                "handTrans": np.array([0.0, 0.0, -0.5]),
                "handBeta": rs.randn(10).astype(np.float32) * 0.1,
            }
            os.makedirs(os.path.join(d, "train", seq, "meta"), exist_ok=True)
            with open(os.path.join(d, "train", seq, "meta", f"{fid}.pkl"), "wb") as f:
                pickle.dump(meta, f)
            _write_img(os.path.join(d, "train", seq, "rgb", f"{fid}.jpg"))
    with open(os.path.join(d, "train.txt"), "w") as f:
        f.write("\n".join(lines))
    return root


def test_ho3d_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import HO3DV3, HO3DMultiView

    ds = HO3DV3(make_ho3d_root(str(tmp_path)), "train")
    assert len(ds) == 4
    j = ds.get_joints_3d(0)
    assert j.shape == (21, 3) and j[0, 2] > 0  # flipped into CV convention
    assert ds.get_verts_3d(0).shape == (778, 3)
    assert np.isfinite(ds.get_joints_2d(0)).all()

    mv = HO3DMultiView(ds)
    assert len(mv) == 2  # 2 frames x (ABF1x group)
    assert len(mv.views_of(0)) == 2


# --------------------------------------------------------------------------
# InterHand
# --------------------------------------------------------------------------
def make_interhand_root(root, n_views=3, frames=2):
    rs = np.random.RandomState(3)
    d = os.path.join(root, "InterHand", "anno_packed", "train")
    os.makedirs(d, exist_ok=True)
    aids, aid = [], 0
    for fr in range(frames):
        for v in range(n_views):
            img = os.path.join(root, "InterHand", "images", f"cap0_f{fr}_v{v}.jpg")
            _write_img(img)
            joints = np.zeros((42, 3), np.float32)
            joints[:21] = _rand_joints(rs) * 1000  # mm
            sample = {
                "img_path": img,
                "joint_cam_coord": joints,
                "focal": [600.0, 600.0],
                "princpt": [320.0, 240.0],
                "camrot": np.eye(3, dtype=np.float32),
                "campos": rs.randn(3).astype(np.float32) * 100,
                "pose": rs.randn(48).astype(np.float32) * 0.1,
                "shape": rs.randn(10).astype(np.float32) * 0.1,
                "idx": aid,
                "capture": 0,
                "frame": fr,
            }
            with open(os.path.join(d, f"{aid}.pkl"), "wb") as f:
                pickle.dump(sample, f)
            aids.append(aid)
            aid += 1
    with open(os.path.join(d, "index.pkl"), "wb") as f:
        pickle.dump(aids, f)
    return root


def test_interhand_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import InterHand, InterHandMultiView

    ds = InterHand(make_interhand_root(str(tmp_path)), "train")
    assert len(ds) == 6
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_cam_extr(0).shape == (4, 4)
    assert ds.get_verts_3d(0).shape == (778, 3)
    mv = InterHandMultiView(ds)
    assert len(mv) == 2 and len(mv.views_of(0)) == 3


# --------------------------------------------------------------------------
# OakInk
# --------------------------------------------------------------------------
def make_oakink_root(root, frames=2):
    rs = np.random.RandomState(4)
    d = os.path.join(root, "OakInk", "image")
    info_list = []
    names = ["north_east_color", "south_east_color", "north_west_color", "south_west_color"]
    for fr in range(frames):
        for v in range(4):
            info = ["A0001/seq1", 0, fr, v]
            info_list.append(info)
            info_str = "__".join(str(x) for x in info).replace("/", "__")
            for kind, data in [
                ("cam_intr", np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)),
                ("hand_j", _rand_joints(rs)),
                ("hand_v", (rs.randn(778, 3) * 0.02 + [0, 0, 0.5]).astype(np.float32)),
            ]:
                p = os.path.join(d, "anno", kind, f"{info_str}.pkl")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as f:
                    pickle.dump(data, f)
            _write_img(os.path.join(d, "stream_release_v2", "A0001/seq1", f"{names[v]}_{fr}.png"))
    os.makedirs(os.path.join(d, "anno", "split", "split0"), exist_ok=True)
    with open(os.path.join(d, "anno", "split", "split0", "seq_train.json"), "w") as f:
        json.dump(info_list, f)
    return root


def test_oakink_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import OakInk, OakInkMultiView

    ds = OakInk(make_oakink_root(str(tmp_path)), "train+val")
    assert len(ds) == 8
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_verts_3d(0).shape == (778, 3)
    assert ds.get_image(0).shape == (32, 32, 3)
    mv = OakInkMultiView(ds)
    assert len(mv) == 2 and len(mv.views_of(0)) == 4


# --------------------------------------------------------------------------
# Arctic
# --------------------------------------------------------------------------
def make_arctic_root(root, n_views=2, frames=2):
    rs = np.random.RandomState(5)
    d = os.path.join(root, "Arctic_Supp", "p1_train")
    os.makedirs(d, exist_ok=True)
    idx = 0
    for fr in range(frames):
        for v in range(n_views):
            img = os.path.join(root, "Arctic", "arctic_data", "data", "images",
                               f"s01/box_grab_01/{v}/{fr:05d}.jpg")
            _write_img(img)
            sample = {
                "imgpath": img,
                "imgname": img,
                "joints_3d_r": _rand_joints(rs),
                "cam_intr": np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32),
                "cam_extr": np.eye(4, dtype=np.float32),
                "pose_r": rs.randn(48).astype(np.float32) * 0.1,
                "betas_r": rs.randn(10).astype(np.float32) * 0.1,
                "image_size": [32, 32],
            }
            with open(os.path.join(d, f"{idx}.pkl"), "wb") as f:
                pickle.dump(sample, f)
            idx += 1
    with open(os.path.join(d, "index.pkl"), "wb") as f:
        pickle.dump(list(range(idx)), f)
    return root


def test_arctic_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import Arctic, ArcticMultiView

    ds = Arctic(make_arctic_root(str(tmp_path)), "train", "p1")
    assert len(ds) == 4
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_verts_3d(0).shape == (778, 3)
    mv = ArcticMultiView(ds)
    assert len(mv) == 2 and len(mv.views_of(0)) == 2


# --------------------------------------------------------------------------
# YT3D
# --------------------------------------------------------------------------
def make_yt3d_root(root, n=2):
    rs = np.random.RandomState(6)
    d = os.path.join(root, "YT3D")
    os.makedirs(d, exist_ok=True)
    images, annotations = [], []
    for i in range(n):
        name = f"youtube/vid{i}/frames/f{i}.png"
        images.append({"id": i, "name": name, "width": 64, "height": 64})
        verts = rs.rand(778, 3).astype(np.float32)
        verts[:, :2] *= 64
        annotations.append({"id": i, "image_id": i, "vertices": verts.tolist(), "is_left": 0})
        _write_img(os.path.join(d, name.replace("youtube", "youtube_annotated")), (64, 64))
    with open(os.path.join(d, "youtube_train.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return root


def test_yt3d_adapter(tmp_path):
    from poem_v2_tpu.data.adapters import YT3D

    ds = YT3D(make_yt3d_root(str(tmp_path)), "train")
    assert len(ds) == 2
    assert ds.get_joints_uvd(0).shape == (21, 3)
    assert ds.get_verts_uvd(0).shape == (778, 3)
    assert ds.get_image(0).shape == (64, 64, 3)
    with pytest.raises(NotImplementedError):
        ds.get_joints_3d(0)


def test_create_dataset_routes_adapters(tmp_path):
    from poem_v2_tpu.data import create_dataset
    from poem_v2_tpu.utils.config import Config

    root = make_freihand_root(str(tmp_path))
    ds = create_dataset(Config({"TYPE": "FreiHAND", "DATA_ROOT": root,
                                "DATA_SPLIT": "train"}))
    assert len(ds) == 6


# --------------------------------------------------------------------------
# OakInk2 dev
# --------------------------------------------------------------------------
def make_oakink2_root(root, cams=("c0", "c1"), frames=2):
    rs = np.random.RandomState(7)
    d = os.path.join(root, "OakInk2_Dev")
    anno = os.path.join(d, "packed_anno")
    tuples = []
    for fr in range(frames):
        for cam in cams:
            t = ["scene_x", "pk01", fr, cam, "rh"]
            tuples.append(t)
            rel_img = f"images/pk01/{cam}/{fr:06d}.jpg"
            _write_img(os.path.join(d, rel_img))
            sample = {
                "image_path": rel_img,
                "cam_intr": np.array([[600.0, 0, 424], [0, 600.0, 240], [0, 0, 1]], np.float32),
                "joints_cam_rgrd": _rand_joints(rs),
                "verts_cam": (rs.randn(778, 3) * 0.02 + [0, 0, 0.5]).astype(np.float32),
                "joints_2d_rgrd": (rs.rand(21, 2) * 32).astype(np.float32),
                "verts_2d": (rs.rand(778, 2) * 32).astype(np.float32),
                "mano_pose_cam": rs.randn(48).astype(np.float32) * 0.1,
                "mano_shape": rs.randn(10).astype(np.float32) * 0.1,
            }
            p = os.path.join(anno, "scene_x", "pk01", "anno_rh", cam, f"{fr:06d}.pkl")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                pickle.dump(sample, f)
    os.makedirs(anno, exist_ok=True)
    with open(os.path.join(anno, "split_meta.json"), "w") as f:
        json.dump({"train": tuples, "val": [], "test": []}, f)
    return root


def test_oakink2_adapter_and_multiview(tmp_path):
    from poem_v2_tpu.data.adapters import OakInk2Dev, OakInk2MultiView

    ds = OakInk2Dev(make_oakink2_root(str(tmp_path)), "train")
    assert len(ds) == 4
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_verts_3d(0).shape == (778, 3)
    assert ds.get_mano_pose(0).shape == (48,)
    assert ds.get_image(0).shape == (32, 32, 3)
    mv = OakInk2MultiView(ds)
    assert len(mv) == 2 and len(mv.views_of(0)) == 2


def test_adapter_dump_then_stream_roundtrip(tmp_path):
    """Close the loop: map-style adapter -> shard dumper -> streaming
    reader -> padded batch (the production train path end-to-end)."""
    from poem_v2_tpu.data import MultiviewWebDataset, create_dataset
    from poem_v2_tpu.data.adapters import DexYCB, DexYCBMultiView
    from poem_v2_tpu.data.collate import collate_padded
    from poem_v2_tpu.data.dumper import dump_dataset
    from poem_v2_tpu.utils.config import Config

    root = make_dexycb_root(str(tmp_path), frames=3)
    mv = DexYCBMultiView(DexYCB(root, sequences=["20200709-subject-01/20200709_141754"]))
    n = dump_dataset(mv, str(tmp_path / "tars"), "DexYCB_mv_test", samples_per_shard=2)
    assert n == 3
    shards = sorted(os.listdir(tmp_path / "tars"))
    assert len(shards) == 2  # 2 + 1 rolls over

    ds = MultiviewWebDataset(
        Config({
            "TYPE": "MultiviewWebDataset",
            "URLS": str(tmp_path / "tars" / "DexYCB_mv_test-{000000..000001}.tar"),
            "DATA_SPLIT": "test",
            "EPOCH_SIZE": 3,
            "RANDOM_N_VIEWS": False,
            "VIEW_MAX": 2,
            "TRANSFORM": {"TYPE": "SimpleTransform3DMultiView", "AUG": False},
        }),
        data_preset=Config({"CENTER_IDX": 0, "NUM_JOINTS": 21, "NUM_VERTS": 778,
                            "IMAGE_SIZE": [32, 32]}),
        is_train=False,
    )
    samples = list(iter(ds))
    assert len(samples) == 3
    batch = collate_padded(samples[:2], view_max=2)
    assert batch["image"].shape == (2, 2, 32, 32, 3)
    assert batch["view_mask"].all()
    assert np.isfinite(batch["master_joints_3d"]).all()


def test_dexycb_s0_split_protocol(tmp_path):
    """Official s0 protocol: per-subject 1/5 hold-out + subject filters
    (dex_ycb_toolkit semantics, reference dexycb.py:82-96)."""
    from poem_v2_tpu.data.adapters.dexycb import S0_SUBJECTS, s0_sequences

    root = tmp_path / "DexYCB"
    for subj in S0_SUBJECTS:
        for i in range(10):
            d = root / subj / f"2020_seq{i:02d}"
            d.mkdir(parents=True)
            (d / "meta.yml").write_text("{}")

    train = s0_sequences(str(root), "train")
    val = s0_sequences(str(root), "val")
    test = s0_sequences(str(root), "test")
    assert len(train) == 10 * 8  # 4/5 of each subject's sequences
    assert len(val) == 2 * 2  # subjects 1-2, every 5th sequence
    assert len(test) == 8 * 2  # subjects 3-10, every 5th sequence
    assert set(train).isdisjoint(set(val) | set(test))
    # held-out sequences are per-subject indices 4 and 9
    assert all(s.split("/")[1][-2:] in ("04", "09") for s in val + test)
    assert all(s.split("/")[0] in S0_SUBJECTS[:2] for s in val)
    assert all(s.split("/")[0] in S0_SUBJECTS[2:] for s in test)


def test_dexycb_test_master_rotation_enumeration(tmp_path):
    """Test split enumerates every camera as master (reference
    dexycb.py:332-349); TEST_WITH_MULTIVIEW=True disables it."""
    from poem_v2_tpu.data.adapters import DexYCB, DexYCBMultiView

    root = make_dexycb_root(str(tmp_path))
    seq = ["20200709-subject-01/20200709_141754"]
    ds = DexYCB(root, data_split="test", sequences=seq)

    mv = DexYCBMultiView(ds, master_system="as_first_camera")
    assert len(mv) == 4  # 2 frames x 2 rotations
    # per frame, each serial leads exactly once
    for frame_pair in ([0, 1], [2, 3]):
        leads = {ds.samples[mv.views_of(i)[0]][1] for i in frame_pair}
        assert leads == {"840412060917", "932122060857"}
        sets = [tuple(sorted(mv.views_of(i))) for i in frame_pair]
        assert sets[0] == sets[1]  # same view set, different master

    mv_plain = DexYCBMultiView(ds, master_system="as_first_camera",
                               test_with_multiview=True)
    assert len(mv_plain) == 2

    # train split never rotates
    ds_tr = DexYCB(root, data_split="train", sequences=seq)
    assert len(DexYCBMultiView(ds_tr, master_system="as_first_camera")) == 2
