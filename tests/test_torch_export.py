"""Reverse interop: flax params -> reference-compatible torch state dict.

Full-circle guarantees (utils/torch_export.py vs utils/torch_import.py):

1. torch -> flax -> torch is the IDENTITY on every tensor the reference
   flagship model owns (state dict from the real reference torch model).
2. The exported dict loads into the real reference model with
   load_state_dict: no unexpected keys; missing only the
   num_batches_tracked counters (dropped by design on import).
3. flax -> torch covers the whole flagship param tree (no skipped leaves).
"""

import numpy as np
import pytest
import torch

from oneshotdet_tpu.utils.torch_export import export_state_dict
from oneshotdet_tpu.utils.torch_import import convert_state_dict

from test_e2e_parity import _setup_reference


@pytest.fixture(scope="module")
def ref_model():
    rc = _setup_reference()
    from maskrcnn_benchmark.modeling.detector.detectors import (
        build_detection_model as ref_build,
    )

    torch.manual_seed(0)
    model = ref_build(rc)
    model.eval()
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "running_mean" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)
    return model


def test_torch_flax_torch_is_identity(ref_model):
    orig = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables, matched, unmatched = convert_state_dict(orig)
    assert not unmatched, unmatched[:10]

    back, exported, skipped = export_state_dict(variables)
    assert not skipped, skipped[:10]
    # every reference tensor except the dropped counters comes back bitwise
    for k, v in orig.items():
        if "num_batches_tracked" in k:
            assert k not in back
            continue
        assert k in back, k
        np.testing.assert_array_equal(back[k], v, err_msg=k)
    assert set(back) == {k for k in orig if "num_batches_tracked" not in k}


def test_exported_dict_loads_into_reference_model(ref_model, tmp_path):
    from oneshotdet_tpu.utils.torch_export import save_torch_checkpoint
    from oneshotdet_tpu.utils.torch_import import load_torch_checkpoint

    orig = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables, _, _ = convert_state_dict(orig)

    path = str(tmp_path / "exported.pth")
    exported, skipped = save_torch_checkpoint(variables, path)
    assert not skipped

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    result = ref_model.load_state_dict(ckpt["model"], strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:10]
    assert all("num_batches_tracked" in k for k in result.missing_keys), (
        result.missing_keys[:10])

    # and the file round-trips through our own importer too
    variables2, matched2, unmatched2 = load_torch_checkpoint(path)
    assert not unmatched2
    flat1 = dict(_flat(variables))
    flat2 = dict(_flat(variables2))
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k], err_msg=k)


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, prefix + "/" + str(k))
    else:
        yield prefix, np.asarray(tree)
