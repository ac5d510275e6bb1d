"""String registry (reference: maskrcnn_benchmark/utils/registry.py).

Registries let configs name implementations ("R-50-FPN-RETINANET") and are
the extension point for new backbones/heads (modeling/registry.py:5-12).
"""

from __future__ import annotations


def _register_generic(module_dict, module_name, module):
    assert module_name not in module_dict, f"{module_name} already registered"
    module_dict[module_name] = module


class Registry(dict):
    """dict with a register() decorator/method."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def register(self, module_name, module=None):
        if module is not None:  # function call style
            _register_generic(self, module_name, module)
            return module

        def register_fn(fn):  # decorator style
            _register_generic(self, module_name, fn)
            return fn

        return register_fn
