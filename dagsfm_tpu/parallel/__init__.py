"""Multi-device / multi-host parallel layer (reference: src/map_reduce).

The reference scales with an rpclib master-worker map-reduce shipping
serialized object graphs (SURVEY.md §2.1-2.2); here the same roles are
filled by jax.sharding over a device Mesh: dense data lives in sharded
arrays, reductions ride ICI collectives (psum/all_gather) inside jit, and
the control plane is plain SPMD program structure instead of RPC polling.
"""
