"""REINA-TPU: a TPU-native agent-based epidemic simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the REINA epidemic model
(kausaltech/reina-model). The population is a struct-of-arrays agent
state stepped by ``lax.scan`` over simulated days; per-agent contact
sampling, infection transmission, disease progression, healthcare
capacity, testing/contact-tracing and vaccination are all expressed as
vectorized XLA programs, with Monte-Carlo ensembles via ``vmap`` and
multi-chip scaling via ``jax.sharding`` meshes.

Layer map (mirrors the reference layer-for-layer, TPU-first):

  frontends   reina_tpu.runtime.graphql / reina_tpu.webui   (reference: corona.py, graphql_*)
  run orch.   reina_tpu.runtime                             (reference: simulation_thread.py)
  driver      reina_tpu.simulation                          (reference: calc/simulation.py)
  config      reina_tpu.config                              (reference: variables.py, common/interventions.py)
  data        reina_tpu.data                                (reference: calc/datasets.py, data/)
  core engine reina_tpu.core + reina_tpu.ops                (reference: cythonsim/)
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist compiled XLA programs across processes (compiles of the
    full day-step program take minutes on TPU; repeat runs of the same
    shapes should be instant). Opt out with REINA_NO_JAX_CACHE=1."""
    import os

    if os.environ.get("REINA_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "REINA_JAX_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         ".jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
