"""surf_tpu — a TPU-native differentiable wavefront path tracer.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of
``nemjit001/surf-path-tracer`` (reference mounted at /root/reference):

- ``core``      — vector math, bit-exact WangHash/xorshift32 RNG, sampling,
                  intersection primitives (reference: headers/surf_math.h,
                  sources/surf_math.cpp, shaders/wavefront_common.glsl).
- ``scene``     — OBJ meshes, materials, instances, camera, the built-in
                  indoor test scene, and the scene compiler that flattens
                  everything into device-resident SoA arrays (reference:
                  sources/mesh.cpp, sources/scene.cpp GPUBatcher, main.cpp).
- ``accel``     — binned-SAH BVH builder (native C++ + NumPy fallback),
                  TLAS/BLAS, refit, and the lockstep traversal used on device
                  (reference: sources/bvh.cpp).
- ``reference`` — slow, trusted NumPy oracle renderer replicating the CPU
                  megakernel semantics bit-for-bit at fixed seed (reference:
                  sources/renderer.cpp:331-463).
- ``wavefront`` — the TPU forward path: raygen/extend/shade/connect/finalize
                  as jitted stages with an on-device ``lax.while_loop`` wave
                  loop (reference: shaders/*.comp, renderer.cpp:939-1157).
- ``diff``      — differentiable estimator (detached discrete sampling) and
                  finite-difference validation harness.
- ``dist``      — multi-chip sharding over a ``jax.sharding.Mesh`` (image
                  tiles sharded, scene replicated, psum gradient reduction).
- ``app``       — CLI, config, metrics, PNG/NPY image output.
"""

__version__ = "0.1.0"
