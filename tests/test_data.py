import json
import os

import numpy as np
import pytest
from PIL import Image

from oneshotdet_tpu.config import cfg
from oneshotdet_tpu.data.collate import BatchCollator
from oneshotdet_tpu.data.datasets.coco import COCODataset
from oneshotdet_tpu.data.evaluation.coco_eval import do_coco_evaluation
from oneshotdet_tpu.data.evaluation.coco_metrics import COCOEvalNumpy
from oneshotdet_tpu.data.evaluation.voc_eval import eval_detection_voc
from oneshotdet_tpu.data.samplers import DistributedSampler, iteration_based_batches
from oneshotdet_tpu.data.transforms import Normalize, Resize, build_transforms, get_resize_size


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    """A tiny COCO-format dataset on disk: 6 images, 2 categories."""
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(6):
        w, h = 120 + 10 * i, 100
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        # one big annotation of cat (i % 2) + 1 and one small one
        cat = (i % 2) + 1
        # polygon covering only the LEFT HALF of the bbox (for MASK_SUPP)
        # 17 COCO-style keypoints: 5 visible inside the bbox, rest unlabeled
        kps = [0.0] * (17 * 3)
        for k, (kx, ky) in enumerate([(20, 20), (40, 30), (60, 40),
                                      (80, 50), (90, 60)]):
            kps[3 * k:3 * k + 3] = [float(kx), float(ky), 2.0]
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": cat,
            "bbox": [10, 10, 90, 80], "area": 7200.0, "iscrowd": 0,
            "segmentation": [[10.0, 10.0, 55.0, 10.0, 55.0, 90.0, 10.0, 90.0]],
            "keypoints": kps, "num_keypoints": 5,
        })
        ann_id += 1
        annotations.append({
            "id": ann_id, "image_id": i + 1, "category_id": cat,
            "bbox": [2, 2, 10, 10], "area": 100.0, "iscrowd": 0,
        })
        ann_id += 1
    ds = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "widget"}, {"id": 2, "name": "gadget"}],
    }
    ann_file = root / "instances.json"
    ann_file.write_text(json.dumps(ds))
    return str(ann_file), str(img_dir)


@pytest.fixture(scope="module")
def small_cfg():
    c = cfg.clone()
    c.FEW_SHOT.TRAINING_EXCL_CATS = []
    c.INPUT.MIN_SIZE_TRAIN = (64,)
    c.INPUT.MAX_SIZE_TRAIN = 96
    c.INPUT.SUPP_MIN_SIZE_TRAIN = (32,)
    c.INPUT.SUPP_MAX_SIZE_TRAIN = 48
    c.INPUT.SUPP_AREA_THRESHOLD = 100
    c.TPU.QUERY_BUCKETS = ((96, 96), (96, 128))
    c.TPU.SUPP_BUCKET = (64, 64)
    c.TPU.MAX_GT_BOXES = 4
    return c


def test_resize_semantics():
    # min-side to 800 capped by max 1200: a 480x640 image -> 800 min side
    # would make max side 1066 <= 1200, so min side = 800
    assert get_resize_size((640, 480), 800, 1200) == (800, 1066)
    # a very wide image hits the max-side cap (transforms.py:43-47)
    assert get_resize_size((2000, 500), 800, 1200) == (300, 1200)


def test_normalize_bgr255():
    img = Image.new("RGB", (4, 4), (255, 0, 0))  # pure red
    n = Normalize([102.9801, 115.9465, 122.7717], [1.0, 1.0, 1.0], to_bgr255=True)
    arr, _ = n(img, None)
    # BGR: channel 0 = blue = 0 -> -102.98; channel 2 = red = 255 -> 132.23
    np.testing.assert_allclose(arr[0, 0, 0], -102.9801, atol=1e-3)
    np.testing.assert_allclose(arr[0, 0, 2], 255 - 122.7717, atol=1e-3)


def test_episodic_dataset(synthetic_coco, small_cfg):
    ann_file, img_dir = synthetic_coco
    transforms = build_transforms(small_cfg, is_train=True)
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=True, transforms=transforms)
    # episodic length = sum over categories of images containing it = 6
    assert len(ds) == 6
    item = ds[0]
    assert item["img"].ndim == 3 and item["img"].shape[2] == 3
    assert len(item["img_supp"]) == 1
    assert item["boxes"].shape[1] == 4
    assert (item["labels"] == 1).all()
    assert item["target_id"] in (1, 2)
    # deterministic episodic shuffle (seed 6666)
    ds2 = COCODataset(small_cfg, ann_file, img_dir, is_train=True, transforms=transforms)
    assert ds.ids == ds2.ids and ds.chosen_cats == ds2.chosen_cats


def test_global_rng_stream_matches_reference_post_shuffle(synthetic_coco, small_cfg):
    """Support selection draws from the global RNG; the reference's stream
    starts from the state AFTER seed(6666) + global shuffle of the episodic
    index list (ref coco.py:70,196). Our shuffle uses a private Random to be
    race-free, then syncs the global state — the post-construction global
    draw stream must be bit-identical to the reference's."""
    import random

    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=True)
    got = [random.random() for _ in range(4)]

    # reference semantics, replayed standalone
    random.seed(6666)
    random.shuffle(list(range(len(ds))))
    want = [random.random() for _ in range(4)]
    assert got == want


def test_class_exclusion(synthetic_coco, small_cfg):
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.FEW_SHOT.TRAINING_EXCL_CATS = [1]  # contiguous id 1 -> json cat 1
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=None)
    assert all(cat == 2 for cat in ds.chosen_cats)


def test_selected_cls_filter(synthetic_coco, small_cfg):
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.FEW_SHOT.TEST_SELECTED_CLS = 2
    ds = COCODataset(c, ann_file, img_dir, is_train=False, transforms=None)
    assert all(cat == 2 for cat in ds.chosen_cats)
    assert len(ds) == 3


def test_mask_supp_zeroes_background(synthetic_coco, small_cfg):
    """FEW_SHOT.MASK_SUPP multiplies the support image by its segmentation
    mask before cropping (ref coco.py:338-348). The fixture's polygon covers
    only the left half of the bbox, so the crop's right half must be zero."""
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.FEW_SHOT.MASK_SUPP = True
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=None)
    supp = ds.get_random_item_from_cat(1, exclude_img_id=-1, shot=1)[0]
    arr = np.asarray(supp)
    w = arr.shape[1]
    assert (arr[:, int(w * 0.6):] == 0).all()          # outside the polygon
    assert arr[:, : int(w * 0.4)].sum() > 0             # inside kept

    c2 = small_cfg.clone()
    ds2 = COCODataset(c2, ann_file, img_dir, is_train=True, transforms=None)
    supp2 = ds2.get_random_item_from_cat(1, exclude_img_id=-1, shot=1)[0]
    assert np.asarray(supp2)[:, int(w * 0.6):].sum() > 0  # unmasked baseline


def test_task1_split_filter(synthetic_coco, small_cfg, tmp_path, monkeypatch):
    """FEW_SHOT.TASK=1 restricts eval images to the split file
    (ref coco.py:146-159)."""
    ann_file, img_dir = synthetic_coco
    split = tmp_path / "task1_test_split.txt"
    split.write_text("000000.jpg extra\n000001.jpg\n")
    monkeypatch.setenv("ONESHOT_TASK1_SPLIT", str(split))
    c = small_cfg.clone()
    c.FEW_SHOT.TASK = 1
    ds = COCODataset(c, ann_file, img_dir, is_train=False, transforms=None)
    kept = {ds.coco.loadImgs(i)[0]["file_name"] for i in ds.ids}
    assert kept <= {"000000.jpg", "000001.jpg"} and len(ds) == 2
    # TASK=2 (default) keeps everything; train mode ignores the filter
    ds2 = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)
    assert len(ds2) == 6


def test_supp_sim_file_cfg_key(synthetic_coco, small_cfg, tmp_path, monkeypatch):
    """FEW_SHOT.SUPP_SIM_FILE points CHOOSE_CLOSE at the similarity pickle
    (replaces the reference's hardcoded path, coco.py:248-250)."""
    import pickle

    ann_file, img_dir = synthetic_coco
    monkeypatch.delenv("ONESHOT_SUPP_SIM_PKL", raising=False)
    # rank annotation 3 (image 2, cat 1) above everything for every query
    sim = {1: {img: {1: {3: 0.9, 1: 0.1}} for img in range(1, 7)}}
    pkl = tmp_path / "supp_sim.pkl"
    pkl.write_bytes(pickle.dumps(sim))
    c = small_cfg.clone()
    c.FEW_SHOT.CHOOSE_CLOSE = True
    c.FEW_SHOT.SUPP_SIM_FILE = str(pkl)
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=None)
    assert ds.close_dict is not None
    supp = ds.get_close_item_from_cat(1, 1, shot=1)
    assert len(supp) == 1 and supp[0].size[0] > 1


def test_mask_on_dataset_rasters(synthetic_coco, small_cfg):
    """MODEL.MASK_ON: the dataset pre-rasterizes each GT's polygons to a
    fixed box-normalized grid and the collator pads them to gt_masks
    (the static replacement for the reference's SegmentationMask target
    field, coco.py:509-520)."""
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.MODEL.MASK_ON = True
    c.TPU.MASK_RASTER = 12
    transforms = build_transforms(c, is_train=True)
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=transforms)
    item = ds[0]
    assert item["masks"].shape[1:] == (12, 12)
    assert item["masks"].shape[0] == len(item["boxes"])
    # the fixture's polygon covers the left half of the big gt box
    assert item["masks"].max() == 1.0
    coll = BatchCollator(c)
    batch = coll([item, ds[1]])
    assert batch["gt_masks"].shape == (2, 4, 12, 12)


def test_collator_buckets(synthetic_coco, small_cfg):
    ann_file, img_dir = synthetic_coco
    transforms = build_transforms(small_cfg, is_train=True)
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=True, transforms=transforms)
    coll = BatchCollator(small_cfg)
    batch = coll([ds[0], ds[1]])
    assert batch["query_pixels"].shape[0] == 2
    h, w = batch["query_pixels"].shape[1:3]
    assert (h, w) in ((96, 96), (96, 128))
    assert batch["gt_xyxy"].shape == (2, 4, 4)
    assert batch["supp_pixels"].shape[0] == 2
    assert batch["gt_valid"].any()


def test_distributed_sampler_partition():
    s0 = DistributedSampler(10, num_replicas=2, rank=0, shuffle=False)
    s1 = DistributedSampler(10, num_replicas=2, rank=1, shuffle=False)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 5
    assert sorted(i0 + i1) == list(range(10))


def test_iteration_based_batches_resume():
    s = DistributedSampler(10, shuffle=False)
    batches = list(iteration_based_batches(s, 2, num_iterations=8, start_iter=3))
    assert len(batches) == 5  # 8 - 3


def test_coco_metrics_perfect_detection():
    gt = {(0, 1): [{"bbox": [10, 10, 50, 50], "area": 2500.0, "iscrowd": 0}]}
    dt = {(0, 1): [{"bbox": [10, 10, 50, 50], "score": 0.9}]}
    ev = COCOEvalNumpy(gt, dt, [1], [0]).evaluate_and_accumulate()
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_coco_metrics_half_iou():
    # shifted detection with IoU ~ 0.5: passes only low thresholds
    gt = {(0, 1): [{"bbox": [0, 0, 100, 100], "area": 10000.0, "iscrowd": 0}]}
    dt = {(0, 1): [{"bbox": [30, 0, 100, 100], "score": 0.9}]}  # iou = 70/130
    ev = COCOEvalNumpy(gt, dt, [1], [0]).evaluate_and_accumulate()
    res = ev.summarize()
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0.0 < res["AP"] < 1.0


def test_coco_metrics_false_positive_ranking():
    gt = {(0, 1): [{"bbox": [0, 0, 50, 50], "area": 2500.0, "iscrowd": 0}]}
    dt = {(0, 1): [
        {"bbox": [200, 200, 50, 50], "score": 0.95},  # FP ranked first
        {"bbox": [0, 0, 50, 50], "score": 0.9},
    ]}
    res = COCOEvalNumpy(gt, dt, [1], [0]).evaluate_and_accumulate().summarize()
    # precision at recall 1.0 is 0.5 -> AP50 ~ 0.5 (101-pt interp)
    assert 0.4 < res["AP50"] <= 0.51


def test_do_coco_evaluation_end_to_end(synthetic_coco, small_cfg, tmp_path):
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)
    predictions = []
    for i in range(len(ds)):
        img_id = ds.ids[i]
        cat = ds.chosen_cats[i]
        anns = ds.coco.loadAnns(ds.coco.getAnnIds(imgIds=img_id, catIds=cat, iscrowd=False))
        info = ds.coco.imgs[img_id]
        boxes = []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w - 1, y + h - 1])
        predictions.append({
            "boxes": np.array(boxes, np.float64),
            "scores": np.linspace(0.9, 0.8, len(boxes)),
            "input_size": (info["width"], info["height"]),
        })
    res = do_coco_evaluation(ds, predictions, output_folder=str(tmp_path))
    assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert os.path.exists(tmp_path / "coco_custom_gt.json")


def test_evaluate_box_proposals_recall(synthetic_coco, small_cfg):
    """AR@N proposal recall (ref coco_eval.py:265-383): perfect proposals ->
    AR 1.0; junk proposals -> 0; the limit cap drops late proposals."""
    from oneshotdet_tpu.data.evaluation.coco_eval import evaluate_box_proposals

    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)

    def preds_from_gt(jitter=0.0, junk=False):
        preds = []
        for ep in range(len(ds)):
            info, cat = ds.get_img_info(ep)
            anns = ds.coco.loadAnns(
                ds.coco.getAnnIds(imgIds=ds.id_to_img_map[ep], catIds=cat, iscrowd=False))
            boxes = []
            for a in anns:
                x, y, w, h = a["bbox"]
                if junk:
                    boxes.append([0.0, 0.0, 2.0, 2.0])
                else:
                    boxes.append([x + jitter, y + jitter,
                                  x + max(w - 1, 0) + jitter, y + max(h - 1, 0) + jitter])
            preds.append({
                "boxes": np.array(boxes, np.float64),
                "scores": np.linspace(1.0, 0.5, len(boxes)),
                "input_size": (info["width"], info["height"]),
            })
        return preds

    res = evaluate_box_proposals(preds_from_gt(), ds)
    assert res["ar"] == 1.0 and res["num_pos"] > 0
    assert evaluate_box_proposals(preds_from_gt(junk=True), ds)["ar"] == 0.0
    # limit=1 keeps only the top-scored proposal per image (2 gts each)
    res_l = evaluate_box_proposals(preds_from_gt(), ds, limit=1)
    assert 0.0 < res_l["ar"] < 1.0
    # area filter: the small annotation (10x10=100 < 32^2) only
    res_s = evaluate_box_proposals(preds_from_gt(), ds, area="small")
    assert res_s["num_pos"] == len(ds) and res_s["ar"] == 1.0


def test_do_coco_evaluation_box_only(synthetic_coco, small_cfg, tmp_path):
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)
    preds = []
    for ep in range(len(ds)):
        info, _ = ds.get_img_info(ep)
        preds.append({
            "boxes": np.array([[10.0, 10.0, 98.0, 88.0]]),
            "scores": np.array([0.9]),
            "input_size": (info["width"], info["height"]),
        })
    res = do_coco_evaluation(ds, preds, output_folder=str(tmp_path), box_only=True)
    assert "AR@100" in res and "ARl@1000" in res
    assert os.path.exists(tmp_path / "box_proposals.json")


def test_segm_iou_type_evaluation(synthetic_coco, small_cfg, tmp_path):
    """MODEL.MASK_ON eval: predictions carrying mask_probs trigger the segm
    COCOeval pass (ref prepare_for_coco_segmentation + COCOeval 'segm').
    A detection whose pasted mask reproduces the gt polygon (left half of
    the box) scores high mask AP50; a full-box mask scores ~0.5 IoU."""
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)

    def preds(left_half=True):
        out = []
        for ep in range(len(ds)):
            info, cat = ds.get_img_info(ep)
            anns = ds.coco.loadAnns(ds.coco.getAnnIds(
                imgIds=ds.id_to_img_map[ep], catIds=cat, iscrowd=False))
            boxes, masks = [], []
            for a in anns:
                x, y, w, h = a["bbox"]
                boxes.append([x, y, x + max(w - 1, 0), y + max(h - 1, 0)])
                m = np.zeros((28, 28), np.float32)
                if left_half:
                    m[:, :14] = 1.0   # matches the fixture polygon
                else:
                    m[:, :] = 1.0
                masks.append(m)
            out.append({
                "boxes": np.array(boxes, np.float64),
                "scores": np.linspace(0.9, 0.6, len(boxes)),
                "input_size": (info["width"], info["height"]),
                "mask_probs": np.stack(masks),
            })
        return out

    res = do_coco_evaluation(ds, preds(True), output_folder=str(tmp_path))
    assert "segm_ap50" in res or any(k.startswith("segm_") for k in res)
    segm_ap50 = next(v for k, v in res.items() if k.startswith("segm_") and "50" in k)
    assert segm_ap50 > 0.45  # the left-half mask matches the big gt only
    res2 = do_coco_evaluation(ds, preds(False), output_folder=str(tmp_path))
    segm2 = next(v for k, v in res2.items() if k.startswith("segm_") and "50" in k)
    assert segm2 <= segm_ap50 + 1e-6


def test_keypoints_iou_type_evaluation(synthetic_coco, small_cfg, tmp_path):
    """MODEL.KEYPOINT_ON eval: predictions carrying keypoints_xy trigger the
    OKS COCOeval pass (ref prepare_for_coco_keypoint + COCOeval
    'keypoints'). Exact keypoints -> OKS 1 -> perfect AP; far-off keypoints
    -> OKS ~0 -> zero AP. GTs without labeled keypoints are ignored
    (pycocotools _prepare num_keypoints==0 rule)."""
    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=False, transforms=None)

    def preds(offset=0.0):
        out = []
        for ep in range(len(ds)):
            info, cat = ds.get_img_info(ep)
            anns = ds.coco.loadAnns(ds.coco.getAnnIds(
                imgIds=ds.id_to_img_map[ep], catIds=cat, iscrowd=False))
            boxes, kxy, ks = [], [], []
            for a in anns:
                x, y, w, h = a["bbox"]
                boxes.append([x, y, x + max(w - 1, 0), y + max(h - 1, 0)])
                g = np.asarray(a.get("keypoints", [0.0] * 51), np.float64)
                xy = np.stack([g[0::3], g[1::3]], axis=1) + offset
                kxy.append(xy)
                ks.append(np.ones(17))
            out.append({
                "boxes": np.array(boxes, np.float64),
                "scores": np.linspace(0.9, 0.6, len(boxes)),
                "input_size": (info["width"], info["height"]),
                "keypoints_xy": np.stack(kxy),
                "keypoints_scores": np.stack(ks),
            })
        return out

    res = do_coco_evaluation(ds, preds(0.0), output_folder=str(tmp_path))
    assert any(k.startswith("keypoints_") for k in res)
    exact = next(v for k, v in res.items()
                 if k.startswith("keypoints_") and k.endswith("AP50"))
    assert exact == pytest.approx(1.0)
    res2 = do_coco_evaluation(ds, preds(500.0), output_folder=str(tmp_path))
    far = next(v for k, v in res2.items()
               if k.startswith("keypoints_") and k.endswith("AP50"))
    assert far == pytest.approx(0.0, abs=1e-6)


def test_oks_iou_oracle():
    """oks_iou against the pycocotools computeOks formula by hand."""
    from oneshotdet_tpu.data.evaluation.coco_metrics import KP_SIGMAS, oks_iou

    g = [0.0] * 51
    g[0:3] = [50.0, 50.0, 2.0]   # one visible keypoint (slot 0, sigma 0.026)
    gt = [{"keypoints": g, "bbox": [0.0, 0.0, 100.0, 100.0], "area": 10000.0}]
    d = [0.0] * 51
    d[0:3] = [50.0, 50.0, 1.0]
    assert oks_iou([{"keypoints": d}], gt)[0, 0] == pytest.approx(1.0)
    # shifted by dx: oks = exp(-dx^2 / (2 * area * (2*sigma)^2))
    d2 = list(d)
    d2[0] = 60.0
    expect = np.exp(-(10.0 ** 2) / ((2 * KP_SIGMAS[0]) ** 2) / 10000.0 / 2.0)
    assert oks_iou([{"keypoints": d2}], gt)[0, 0] == pytest.approx(expect)
    # no visible gt keypoints: falls back to the doubled-bbox distance; a dt
    # point inside the expanded box contributes exp(0) = 1 at every slot
    g0 = [0.0] * 51
    gt0 = [{"keypoints": g0, "bbox": [40.0, 40.0, 20.0, 20.0], "area": 400.0}]
    d_in = [50.0, 50.0, 1.0] * 17
    assert oks_iou([{"keypoints": d_in}], gt0)[0, 0] == pytest.approx(1.0)


def test_voc_eval_perfect_and_missed():
    gt = [{"boxes": np.array([[0, 0, 49, 49], [60, 60, 99, 99]]),
           "labels": np.array([1, 1]), "difficult": np.array([False, False])}]
    pred = [{"boxes": np.array([[0, 0, 49, 49]]), "scores": np.array([0.9]),
             "labels": np.array([1])}]
    res = eval_detection_voc(pred, gt, use_07_metric=True)
    # one of two gts found at full precision: recall 0.5 -> 11-pt AP ~ 6/11
    assert res["ap"][1] == pytest.approx(6 / 11, abs=1e-6)

    pred_full = [{"boxes": np.array([[0, 0, 49, 49], [60, 60, 99, 99]]),
                  "scores": np.array([0.9, 0.8]), "labels": np.array([1, 1])}]
    res = eval_detection_voc(pred_full, gt, use_07_metric=True)
    assert res["ap"][1] == pytest.approx(1.0)


def test_voc_eval_difficult_ignored():
    gt = [{"boxes": np.array([[0, 0, 49, 49]]), "labels": np.array([1]),
           "difficult": np.array([True])}]
    pred = [{"boxes": np.array([[0, 0, 49, 49]]), "scores": np.array([0.9]),
             "labels": np.array([1])}]
    res = eval_detection_voc(pred, gt, use_07_metric=True)
    assert np.isnan(res["ap"][1])  # no non-difficult gt -> undefined AP


def test_grouped_batches_single_orientation(synthetic_coco, small_cfg):
    from oneshotdet_tpu.data.samplers import grouped_batches

    ann_file, img_dir = synthetic_coco
    ds = COCODataset(small_cfg, ann_file, img_dir, is_train=True, transforms=None)
    batches = list(grouped_batches(ds, range(len(ds)), 2, drop_last=False))
    assert sum(len(b) for b in batches) == len(ds)
    for batch in batches:
        orients = set()
        for i in batch:
            info, _ = ds.get_img_info(i)
            orients.add(info["width"] >= info["height"])
        assert len(orients) == 1


def test_imagenet_dataset_preset(synthetic_coco, small_cfg, tmp_path, monkeypatch):
    from PIL import Image

    from oneshotdet_tpu.data.datasets.imagenet import ImagenetDataset

    ann_file, img_dir = synthetic_coco
    # preset support crop for contiguous class 1
    Image.new("RGB", (60, 60), (200, 30, 30)).save(tmp_path / "1.jpg")
    ds = ImagenetDataset(small_cfg, ann_file, img_dir, is_train=False,
                         transforms=build_transforms(small_cfg, False),
                         preset_supp_dir=str(tmp_path))
    item = ds[0]
    assert len(item["img_supp"]) == 1
    assert item["img_supp"][0].ndim == 3


def test_comm_single_process():
    from oneshotdet_tpu.utils import comm

    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    out = comm.reduce_dict({"x": 2.0})
    assert out["x"] == 2.0


def test_fused_native_pipeline(synthetic_coco, small_cfg):
    """Fused C++ preprocess path matches the python PIL path closely."""
    from oneshotdet_tpu.csrc import load as load_native
    from oneshotdet_tpu.data.transforms import build_fused_transforms

    ann_file, img_dir = synthetic_coco
    ds_py = COCODataset(small_cfg, ann_file, img_dir, is_train=False,
                        transforms=build_transforms(small_cfg, False))
    ds_nat = COCODataset(small_cfg, ann_file, img_dir, is_train=False,
                         transforms=build_fused_transforms(small_cfg, False))
    coll = BatchCollator(small_cfg)
    b_py = coll([ds_py[0], ds_py[1]])
    b_nat = coll([ds_nat[0], ds_nat[1]])
    assert b_py["query_pixels"].shape == b_nat["query_pixels"].shape
    np.testing.assert_allclose(b_py["query_sizes"], b_nat["query_sizes"])
    np.testing.assert_allclose(b_py["gt_xyxy"], b_nat["gt_xyxy"], atol=1e-4)
    if load_native() is not None:
        # pixel parity: PIL uses fixed-point coefficients -> within ~1.5 LSB
        diff = np.abs(b_py["query_pixels"] - b_nat["query_pixels"])
        assert diff.max() <= 2.0
        assert diff.mean() < 0.3


def test_space_to_depth_native_matches_numpy():
    from oneshotdet_tpu.csrc import space_to_depth_native

    x = np.random.RandomState(1).randn(2, 64, 96, 3).astype(np.float32)
    b, h, w, c = x.shape
    ref = np.ascontiguousarray(
        x.reshape(b, h // 2, 2, w // 2, 2, c)
         .transpose(0, 1, 3, 2, 4, 5)
         .reshape(b, h // 2, w // 2, 4 * c))
    out = space_to_depth_native(x)
    if out is None:
        pytest.skip("native lib unavailable")
    assert np.array_equal(out, ref)


def test_process_loader_matches_thread_loader(synthetic_coco, small_cfg):
    """ProcessLoader (fork + shm ring) delivers the same batch structure as
    the thread loader; arrays compared where the pipeline is deterministic
    (query pixels, gt, ids)."""
    import random as pyrandom

    from oneshotdet_tpu.data.build import make_data_loader

    ann_file, img_dir = synthetic_coco
    os.environ["ONESHOT_CUSTOM_IMG_DIR"] = img_dir
    os.environ["ONESHOT_CUSTOM_ANN_FILE"] = ann_file
    c = small_cfg.clone()
    c.DATASETS.TEST = ("custom",)
    c.TEST.IMS_PER_BATCH = 2
    c.DATALOADER.NUM_WORKERS = 2

    def grab(use_procs, n=2):
        cc = c.clone()
        cc.DATALOADER.USE_PROCESS_WORKERS = use_procs
        pyrandom.seed(0)
        loader, _ = make_data_loader(cc, is_train=False)
        out = []
        for i, b in enumerate(loader):
            out.append(b)
            if i + 1 >= n:
                break
        return out

    thread_batches = grab(False)
    proc_batches = grab(True)
    assert len(thread_batches) == len(proc_batches)
    for tb, pb in zip(thread_batches, proc_batches):
        # order first: if this ever fires, the mismatch is a batch-ordering
        # race, not pixel corruption (diagnosed flaky under heavy CPU load)
        np.testing.assert_array_equal(tb["idxs"], pb["idxs"])
        np.testing.assert_array_equal(tb["img_ids"], pb["img_ids"])
        assert tb["query_pixels"].shape == pb["query_pixels"].shape
        np.testing.assert_array_equal(tb["query_pixels"], pb["query_pixels"])
        np.testing.assert_array_equal(tb["gt_xyxy"], pb["gt_xyxy"])
        assert tb["supp_pixels"].shape == pb["supp_pixels"].shape


def test_loader_is_reiterable(synthetic_coco, small_cfg):
    """Regression: train_net consumes one batch for shape-init, then
    do_train iterates the loader again — both iterations must see the full
    stream (a single-use generator silently trained 0 iterations)."""
    from oneshotdet_tpu.data.build import make_data_loader

    ann_file, img_dir = synthetic_coco
    os.environ["ONESHOT_CUSTOM_IMG_DIR"] = img_dir
    os.environ["ONESHOT_CUSTOM_ANN_FILE"] = ann_file
    c = small_cfg.clone()
    c.DATASETS.TRAIN = ("custom",)
    c.SOLVER.IMS_PER_BATCH = 2
    c.SOLVER.MAX_ITER = 3
    c.DATALOADER.NUM_WORKERS = 2
    for use_procs in (False, True):
        cc = c.clone()
        cc.DATALOADER.USE_PROCESS_WORKERS = use_procs
        loader, _ = make_data_loader(cc, is_train=True)
        first_pass = [b["idxs"].tolist() for b in loader]
        second_pass = [b["idxs"].tolist() for b in loader]
        assert len(first_pass) == len(second_pass) == 3, use_procs
        assert first_pass == second_pass, use_procs


def test_mask_collate_all_degenerate_gt(synthetic_coco, small_cfg):
    """A MASK_ON item whose GT boxes were all dropped yields (0, S, S)
    masks; the collator must still produce a (max_gt, S, S) part so
    assemble()'s np.stack doesn't crash (ADVICE r2 medium)."""
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.MODEL.MASK_ON = True
    c.TPU.MASK_RASTER = 12
    transforms = build_transforms(c, is_train=True)
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=transforms)
    item = ds[0]
    degenerate = dict(item)
    degenerate["boxes"] = item["boxes"][:0]
    degenerate["labels"] = item["labels"][:0]
    degenerate["masks"] = item["masks"][:0]  # (0, 12, 12)
    coll = BatchCollator(c)
    batch = coll([item, degenerate])
    assert batch["gt_masks"].shape == (2, 4, 12, 12)
    assert not batch["gt_valid"][1].any()


def test_keypoint_on_dataset_and_collator(synthetic_coco, small_cfg):
    """MODEL.KEYPOINT_ON: the dataset carries per-GT (K, 3) keypoints
    through the geometric transforms and the collator pads/stacks them to
    gt_keypoints — the training path the reference wires via
    PersonKeypoints target fields (ref coco.py / roi_heads)."""
    ann_file, img_dir = synthetic_coco
    c = small_cfg.clone()
    c.MODEL.KEYPOINT_ON = True
    transforms = build_transforms(c, is_train=False)  # no flip: deterministic
    ds = COCODataset(c, ann_file, img_dir, is_train=True, transforms=transforms)
    item = ds[0]
    assert "keypoints" in item
    n, k, three = item["keypoints"].shape
    assert (n, k, three) == (len(item["boxes"]), 17, 3)
    # visible keypoints were resized along with the image: they stay inside
    vis = item["keypoints"][..., 2] > 0
    if vis.any():
        xs = item["keypoints"][..., 0][vis]
        assert (xs >= 0).all() and (xs <= item["img"].shape[1]).all()
    coll = BatchCollator(c)
    batch = coll([item, ds[1]])
    assert batch["gt_keypoints"].shape == (2, 4, 17, 3)
    # batch_to_inputs must surface them as a target field for the trainer
    import jax.numpy as jnp

    from oneshotdet_tpu.engine.trainer import batch_to_inputs

    jb = {kk: jnp.asarray(v) for kk, v in batch.items()
          if kk not in ("img_ids", "idxs")}
    _, _, targets = batch_to_inputs(jb)
    assert targets.get_field("keypoints").shape == (2, 4, 17, 3)
