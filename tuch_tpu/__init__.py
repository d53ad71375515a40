"""tuch_tpu: TPU-native self-contact human pose & shape framework."""

import os

__version__ = '0.1.0'


def _setup_compilation_cache():
    """Enable the persistent XLA compilation cache by default.

    The contact-heavy training/fitting graphs take minutes to compile; the
    cache makes every process after the first start in seconds. Override
    the location with TUCH_JAX_CACHE=<dir>, disable with TUCH_JAX_CACHE=0.
    """
    loc = os.environ.get('TUCH_JAX_CACHE')
    if loc == '0':
        return
    if not loc:
        loc = os.path.join(os.path.expanduser('~'), '.cache', 'tuch_tpu',
                           'jax')
    try:
        import jax
        os.makedirs(loc, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', loc)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:
        pass


def _honor_jax_platforms_env():
    """Make JAX_PLATFORMS behave as documented even under site hooks.

    This container's sitecustomize force-registers the axon TPU backend
    and overrides jax_platforms AFTER the env var is read, so
    `JAX_PLATFORMS=cpu python -m tuch_tpu.cli.*` silently ran on the TPU
    tunnel (CLAUDE.md gotcha; measured: two such "CPU" runs can wedge
    the tunnel). Re-asserting the env value at package import restores
    the standard JAX contract for every CLI and library user.
    """
    plat = os.environ.get('JAX_PLATFORMS')
    if not plat:
        return
    try:
        import jax
        jax.config.update('jax_platforms', plat)
    except Exception:
        pass


_setup_compilation_cache()
_honor_jax_platforms_env()
