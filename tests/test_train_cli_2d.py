"""End-to-end train CLI on the 2-D (data, model) mesh.

Drives tools/train_net.py exactly as a user would (subprocess, yaml-free
opts) with TPU.MESH_AXES=("data","model") + TPU.MESH_SHAPE=(2,-1) on a
4-device CPU mesh: covers the config keys, shard_train_state, the
jit_train_step 2-D branch, do_train's shard_batch_2d routing, and
checkpoint save — the full CLI path of the dp x (tp+sp) feature.

4 devices (not the suite's usual 8), a small query bucket, and the
flagship 256-channel sizing (BACKBONE_OUT_CHANNELS 256 — the config
default mirrors the reference's 1024, a 280.9M-param model) are
deliberate: XLA CPU collectives abort the process when a rendezvous
participant is >40 s late (rendezvous.cc termination timeout, not
configurable), and on this 1-core host device threads time-slicing a
full conv segment of the 1024-ch model exceed that. Measured: the
1024-ch default dies in CollectivePermute (halo exchange) at both 8 and
4 devices; the 256-ch flagship sizing completes with margin.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_2d_mesh(tmp_path):
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
    out_dir = tmp_path / "out"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["ONESHOT_CUSTOM_IMG_DIR"] = str(img_dir)
    env["ONESHOT_CUSTOM_ANN_FILE"] = str(ann_file)
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    opts = [
        "MODEL.BACKBONE.CONV_BODY", "R-50-FPN-RETINANET",
        "MODEL.RESNETS.BACKBONE_OUT_CHANNELS", "256",
        "MODEL.RETINANET.USE_C5", "False",
        "DATASETS.TRAIN", "('custom',)",
        "OUTPUT_DIR", str(out_dir),
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        "DATALOADER.NUM_WORKERS", "0",
        "FEW_SHOT.TRAINING_EXCL_CATS", "[]",
        "INPUT.MIN_SIZE_TRAIN", "(64,)",
        "INPUT.MAX_SIZE_TRAIN", "96",
        "INPUT.SUPP_MIN_SIZE_TRAIN", "(32,)",
        "INPUT.SUPP_MAX_SIZE_TRAIN", "48",
        "INPUT.SUPP_AREA_THRESHOLD", "100",
        "TPU.QUERY_BUCKETS", "((64, 96),)",
        "TPU.SUPP_BUCKET", "(64, 64)",
        "TPU.MAX_GT_BOXES", "4",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.MESH_AXES", "('data', 'model')",
        "TPU.MESH_SHAPE", "(2, -1)",
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "64",
        "MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN", "16",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "8",
        "TPU.NMS_PRE_TOPK", "128",
        "FEW_SHOT.SIAMESE_BACKBONE", "True",
        "FEW_SHOT.SECOND_STAGE_METHOD", "concat",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
         "--skip-test", "--device", "cpu"] + opts,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # iteration log line reached max_iter and checkpoints landed
    assert "iter 2/2" in proc.stdout + proc.stderr, proc.stderr[-2000:]
    assert (out_dir / "model_final").exists() or any(
        p.name.startswith("model_") for p in out_dir.iterdir()), \
        sorted(os.listdir(out_dir))
