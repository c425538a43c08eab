"""One process of a 2-process `jax.distributed` cluster for
`tests/test_multihost.py` (not a pytest module itself).

Usage: python multihost_worker.py <process_id> <coordinator_port>

Each process contributes 2 virtual CPU devices (set via XLA_FLAGS by the
parent test); the distributed init + the full sharded train step then run
exactly as they would across hosts over DCN
(`mmduet_tpu.parallel.mesh.initialize_distributed` is the same call).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]

import jax  # noqa: E402

# the environment's sitecustomize force-registers the TPU backend; pin CPU
# at the config level before the backend initializes (same trick as conftest)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as g  # noqa: E402

g._dryrun_multichip_impl(4)
