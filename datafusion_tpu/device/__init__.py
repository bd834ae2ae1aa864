"""Device compute path: jit-compiled XLA/TPU kernels for the hot operators.

Where the host path (`physical/`) runs vectorized numpy per batch, this
package provides traceable JAX equivalents with static shapes — the
bucketed-tile design of SURVEY.md §7: masked fixed-capacity arrays,
sort-based grouping (argsort -> change-flags -> cumsum ids -> segment
reductions), and shard_map collectives for the distributed exchange.
"""
import os as _os

import jax as _jax

# int64 keys and float64 accumulation are part of SQL semantics; enable
# regardless of import order (the env-var path in __init__ only works when
# datafusion_tpu is imported before jax).
_jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TPU compiles (especially through remote
# compile tunnels) are expensive; query shapes repeat across runs.
_cache_dir = _os.environ.get("DATAFUSION_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/datafusion_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass

from .groupby import device_group_aggregate, device_filter_reduce  # noqa: F401,E402
