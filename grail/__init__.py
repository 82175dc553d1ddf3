"""grail — a TPU-native differentiable path tracer with the capabilities of pbrt-v2.

Brand-new architecture (not a port): scenes compile to structure-of-arrays JAX pytrees
(triangles, flattened wide BVH, material/light/texture tables); rendering runs as a
wavefront Monte Carlo engine under jit — ray generation, BVH traversal, masked-megabatch
BSDF evaluation, MIS light sampling, Russian-roulette continuation, atomic-free film
accumulation — differentiable end-to-end and sharded over TPU meshes via shard_map.

Reference capability map: see SURVEY.md (structural analysis of mmp/pbrt-v2).
"""

__version__ = "0.1.0"
