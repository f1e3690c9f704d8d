"""kgdet_tpu: a TPU-native (JAX/XLA/Pallas) keypoint-guided detection framework.

Re-designed from scratch for TPU with the capability surface of KGDet
(AAAI-2021, keypoint-guided single-stage garment detection on DeepFashion2):
configs -> model builder -> data pipeline -> train/eval loops ->
DeepFashion2-compatible JSON results + COCO/OKS evaluation.
"""

import os as _os

__version__ = '0.1.0'

# Persistent XLA compilation cache: full-model compiles are expensive (and on
# this environment go through a remote-compile tunnel), so cache them across
# processes. Overridable via the standard env vars. The env vars only take
# effect if jax has not been imported yet, so also push through jax.config.
_os.environ.setdefault(
    'JAX_COMPILATION_CACHE_DIR',
    _os.path.expanduser('~/.cache/jax_kgdet'))
_os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

try:
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update('jax_compilation_cache_dir',
                           _os.environ['JAX_COMPILATION_CACHE_DIR'])
    _jax.config.update(
        'jax_persistent_cache_min_compile_time_secs',
        int(_os.environ['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS']))
except Exception:  # pragma: no cover - cache is an optimization only
    pass
