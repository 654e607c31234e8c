"""evreal_tpu — a TPU-native (JAX/XLA/Pallas) event-camera video reconstruction
evaluation framework with the capabilities of EVREAL (ercanburak/EVREAL).

Design (see SURVEY.md for the reference layer map):
  * functional core: every model is ``(params, state, voxel, aux) -> (image, state)``
    with explicit state pytrees; sequences run under ``jax.lax.scan``.
  * device-resident pipeline: events -> voxel -> model -> metrics compiled into
    one XLA program per (model, resolution, event-capacity bucket).
  * parallel axes: (sequence x method x sweep-config) work units sharded over a
    ``jax.sharding.Mesh``; no collective communication is required by the
    algorithm itself.
"""

__version__ = "0.1.0"
