"""Batched TFHE device kernels (XLA + Pallas).

This package is the TPU-native replacement for the reference's worker herd:
the `Worker::{map,reduce}` rpc contract (reference
src/execution/worker/grpc/grpc_worker_group.cpp:85-94) whose `hived` workers
evaluate boolean circuits gate-by-gate with OpenFHE binfhe. Here every gate is
a batched device program: one blind rotation evaluates a whole batch of
ciphertexts at once, and the negacyclic polynomial products ride the MXU as
int8-limb matmuls/convolutions.
"""
