"""Model-zoo weight resolution: catalog:// names and URL download cache.

Rebuilds maskrcnn_benchmark/utils/model_zoo.py:20-66 (cache_url: rank-0
download + barrier, fragment/filename conventions, Detectron
model_final.pkl disambiguation) and the catalog:// branch of
maskrcnn_benchmark/utils/checkpoint.py:133-145 (DetectronCheckpointer.
_load_file) without torch: stdlib urllib does the transfer, so ``file://``
URLs work offline for tests and air-gapped hosts.

The ModelCatalog itself (name -> URL table) lives in
``oneshotdet_tpu/data/paths_catalog.py`` next to DatasetCatalog, mirroring
the reference's config/paths_catalog.py:149-208 layout; a custom catalog
module can be supplied via cfg.PATHS_CATALOG just like the reference.
"""

from __future__ import annotations

import os
import re
import sys
import urllib.parse
import urllib.request

from .comm import is_main_process, synchronize

# torch.hub's convention: filename-<sha256-prefix>.ext
HASH_REGEX = re.compile(r"-([a-f0-9]*)\.")


def default_cache_dir() -> str:
    home = os.path.expanduser(os.getenv("ONESHOT_HOME", "~/.oneshotdet_tpu"))
    return os.getenv("ONESHOT_MODEL_ZOO", os.path.join(home, "models"))


def cache_url(url: str, model_dir: str | None = None, progress: bool = True) -> str:
    """Download ``url`` into the local model cache (once) and return the path.

    Reference semantics (model_zoo.py:20-66):
      - the URL fragment, when present, names the cached file;
      - Detectron Caffe2 checkpoints are all called ``model_final.pkl``, so
        the full path (slashes -> underscores) becomes the filename;
      - only the main process downloads; everyone else waits on a barrier.

    ``file://`` URLs are copied through the same code path, which keeps the
    resolution logic testable offline.
    """
    if model_dir is None:
        model_dir = default_cache_dir()
    os.makedirs(model_dir, exist_ok=True)
    parts = urllib.parse.urlparse(url)
    if parts.fragment:
        filename = parts.fragment
    else:
        filename = os.path.basename(parts.path)
    if filename == "model_final.pkl":
        # Detectron C2 checkpoints share this name; disambiguate by path
        filename = parts.path.replace("/", "_")
    cached_file = os.path.join(model_dir, filename)
    if not os.path.exists(cached_file) and is_main_process():
        sys.stderr.write(f'Downloading: "{url}" to {cached_file}\n')
        tmp = cached_file + ".part"
        urllib.request.urlretrieve(url, tmp)
        hash_prefix = HASH_REGEX.search(filename)
        if hash_prefix is not None:
            prefix = hash_prefix.group(1)
            # reference workaround: Caffe2 files have no real hash; only
            # verify when the prefix is long enough to be one
            if len(prefix) >= 6:
                import hashlib

                digest = hashlib.sha256()
                with open(tmp, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        digest.update(chunk)
                if not digest.hexdigest().startswith(prefix):
                    os.remove(tmp)
                    raise RuntimeError(
                        f"invalid hash value for {url}: expected prefix "
                        f"{prefix}, got {digest.hexdigest()}"
                    )
        os.replace(tmp, cached_file)
    synchronize()
    return cached_file


def resolve_weight_path(f: str, cfg=None, model_dir: str | None = None,
                        logger=None) -> str:
    """catalog:// -> URL -> cached local file (checkpoint.py:133-145).

    Plain local paths pass through unchanged. ``cfg.PATHS_CATALOG``, when
    set, names a python file whose ModelCatalog overrides the built-in one
    (reference import_file mechanism, checkpoint.py:135-137).
    """

    def log(msg):
        (logger.info if logger else print)(msg)

    if f.startswith("catalog://"):
        catalog = _load_model_catalog(cfg)
        resolved = catalog.get(f[len("catalog://"):])
        log(f"{f} points to {resolved}")
        f = resolved
    if f.startswith(("http://", "https://", "file://")):
        cached = cache_url(f, model_dir=model_dir)
        log(f"url {f} cached in {cached}")
        f = cached
    return f


def _load_model_catalog(cfg):
    if cfg is not None and getattr(cfg, "PATHS_CATALOG", ""):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "oneshotdet_tpu._user_paths_catalog", cfg.PATHS_CATALOG
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.ModelCatalog
    from ..data.paths_catalog import ModelCatalog

    return ModelCatalog
