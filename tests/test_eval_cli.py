"""End-to-end eval CLI: tools/test_net.py --seq_test.

Drives the reference's primary evaluation protocol (reference
tools/test_net.py:68-83) exactly as a user would: train a tiny model for 3
iterations with CHECKPOINT_PERIOD=1 (producing model_0000001..3 +
model_final and a last_checkpoint tag), then subprocess-run the eval CLI
with TEST.MIN_ITER/MAX_ITER filtering and assert

  - only checkpoints inside [MIN_ITER, MAX_ITER] are evaluated, each into
    its own OUTPUT_DIR/eval_{iter} folder with COCO eval artifacts;
  - the checkpoint named in the seq_test loop is the one actually LOADED.
    Regression for the last_checkpoint-precedence bug: Checkpointer.load
    gives the tag file precedence over an explicit path (reference
    checkpoint.py:53-57), so a checkpointer rooted at TEST.LOAD_DIR would
    silently evaluate model_final for every entry.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny flagship-path sizing shared by the train and eval subprocesses
# (mirrors test_train_cli_2d.py, minus the mesh keys: single CPU device)
TINY_OPTS = [
    "MODEL.BACKBONE.CONV_BODY", "R-50-FPN-RETINANET",
    "MODEL.RESNETS.BACKBONE_OUT_CHANNELS", "256",
    "MODEL.RETINANET.USE_C5", "False",
    "DATALOADER.NUM_WORKERS", "0",
    "FEW_SHOT.TRAINING_EXCL_CATS", "[]",
    "INPUT.MIN_SIZE_TRAIN", "(64,)",
    "INPUT.MAX_SIZE_TRAIN", "96",
    "INPUT.SUPP_MIN_SIZE_TRAIN", "(32,)",
    "INPUT.SUPP_MAX_SIZE_TRAIN", "48",
    "INPUT.MIN_SIZE_TEST", "64",
    "INPUT.MAX_SIZE_TEST", "96",
    "INPUT.SUPP_MIN_SIZE_TEST", "32",
    "INPUT.SUPP_MAX_SIZE_TEST", "48",
    "INPUT.SUPP_AREA_THRESHOLD", "100",
    "TPU.QUERY_BUCKETS", "((64, 96),)",
    "TPU.SUPP_BUCKET", "(64, 64)",
    "TPU.MAX_GT_BOXES", "4",
    "TPU.COMPUTE_DTYPE", "float32",
    "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "64",
    "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "16",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "8",
    "TPU.NMS_PRE_TOPK", "128",
    "FEW_SHOT.SIAMESE_BACKBONE", "True",
    "FEW_SHOT.SECOND_STAGE_METHOD", "concat",
]


def _write_synthetic_coco(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(4):
        arr = rng.randint(0, 255, (100, 120, 3), np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        images.append({"id": i + 1, "file_name": name, "width": 120, "height": 100})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10, 10, 90, 80], "area": 7200.0, "iscrowd": 0,
        })
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "widget"}],
    }))
    return img_dir, ann_file


@pytest.mark.slow
def test_eval_cli_seq_test(tmp_path):
    img_dir, ann_file = _write_synthetic_coco(tmp_path)
    train_dir = tmp_path / "train_out"
    eval_dir = tmp_path / "eval_out"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["ONESHOT_CUSTOM_IMG_DIR"] = str(img_dir)
    env["ONESHOT_CUSTOM_ANN_FILE"] = str(ann_file)
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    # --- stage 1: produce model_0000001..3 (+ model_final + tag file)
    train_opts = TINY_OPTS + [
        "DATASETS.TRAIN", "('custom',)",
        "OUTPUT_DIR", str(train_dir),
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "3",
        "SOLVER.CHECKPOINT_PERIOD", "1",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
         "--skip-test", "--device", "cpu"] + train_opts,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ckpts = sorted(p for p in os.listdir(train_dir) if p.startswith("model_"))
    assert {"model_0000001", "model_0000002", "model_0000003"} <= set(ckpts), ckpts
    # the tag file that triggers the precedence bug must be present
    assert (train_dir / "last_checkpoint").exists()

    # --- stage 2: seq_test over [MIN_ITER=2, MAX_ITER=3]
    eval_opts = TINY_OPTS + [
        "DATASETS.TEST", "('custom',)",
        "OUTPUT_DIR", str(eval_dir),
        "TEST.IMS_PER_BATCH", "2",
        "TEST.LOAD_DIR", str(train_dir),
        "TEST.MIN_ITER", "2",
        "TEST.MAX_ITER", "3",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_net.py"),
         "--seq_test", "--device", "cpu"] + eval_opts,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]

    # per-checkpoint OUTPUT_DIR with COCO eval artifacts; MIN/MAX_ITER filter
    for it in (2, 3):
        d = eval_dir / f"eval_{it:07d}"
        assert d.is_dir(), sorted(os.listdir(eval_dir))
        assert (d / "coco_custom_result.json").exists(), sorted(os.listdir(d))
    assert not (eval_dir / "eval_0000001").exists()

    # the loop names each checkpoint...
    assert "=== seq_test checkpoint" in out
    # ...and LOADS that checkpoint (not the last_checkpoint tag target):
    loaded = re.findall(r"Loading checkpoint from (\S+)", out)
    loaded_names = sorted(os.path.basename(p) for p in loaded)
    assert loaded_names == ["model_0000002", "model_0000003"], loaded_names
