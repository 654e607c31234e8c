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
  * native runtime: the data layer's hot host loop runs in C++
    (``evreal_tpu/native``); a Pallas voxelizer kernel is selectable.
  * beyond the reference: lockstep multi-sequence batched eval, scan-BPTT
    training with orbax checkpoint/resume (``train.py``), bf16 mode.
"""

__version__ = "0.1.0"
