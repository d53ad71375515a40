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


_setup_compilation_cache()
