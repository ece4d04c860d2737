"""On-device models: CLIP image/text towers, SAM-style mask generator, VLM.

All models are pure-functional: parameters are nested dicts of jnp arrays
(per-layer tensors stacked on a leading `layers` axis so the transformer body
is one `lax.scan`), apply functions are jit/vmap/pjit-transparent, and tensor
parallelism is expressed by sharding the stacked parameter pytrees over the
`model` mesh axis (see holoagent_tpu.parallel.sharding).
"""
