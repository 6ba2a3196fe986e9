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
    shapes should be instant). Opt out with REINA_NO_JAX_CACHE=1.

    Routed through utils.compile.enable_persistent_cache so CPU-forced
    processes get the per-host-CPU subdirectory (foreign machines'
    XLA:CPU AOT executables segfault at load)."""
    import os

    if os.environ.get("REINA_NO_JAX_CACHE"):
        return
    try:
        from .utils.compile import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass


_enable_compilation_cache()
