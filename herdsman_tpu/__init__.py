"""herdsman_tpu — a TPU-native FHE execution stack.

A from-scratch rebuild of the capabilities of herd-fhe/herdsman (the HERD
coordinator: sessions, encrypted data frames, execution-plan DAG scheduling over
a worker herd — see /root/reference, SURVEY.md) as a JAX/XLA/Pallas-first
framework:

- ``core``     — TFHE math over the discretized torus Z_{2^32}: parameters,
                 LWE/GLWE/GGSW, and an exact-integer NumPy reference
                 implementation used as the bit-exactness anchor.
- ``ops``      — batched device kernels (XLA + Pallas): negacyclic polynomial
                 multiplication, gadget decomposition, external products,
                 blind-rotation bootstrapping, key switching, boolean gates.
- ``circuit``  — the circuit/plan domain model (the herd_common analog):
                 boolean-gate DAGs, Input/Map/Reduce/Output stage plans.
- ``compiler`` — lowers circuits and stage DAGs to jitted XLA dataflow
                 programs (replaces the reference's ExecutionService/Executor
                 task queue, reference src/service/execution_service.cpp).
- ``mesh``     — multi-chip sharding: jax.sharding.Mesh axes, collectives.
- ``service``  — API-parity control plane: sessions, key store, data-frame
                 storage (same disk namespace and partition semantics as the
                 reference, src/service/storage_service.cpp), job API, config.
"""

__version__ = "0.1.0"
