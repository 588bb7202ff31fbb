import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# never read/write the production gate cache from tests: the in-process
# cpu pin below is invisible to its key, and a True cached by a real-TPU
# run would flip the default engine under the tests
os.environ["LOFREQ_TPU_GATE_CACHE"] = "0"

import jax  # noqa: E402

# Tests run on a virtual 8-device CPU mesh; real-TPU runs use the axon
# platform selected by the environment.
jax.config.update("jax_platforms", "cpu")
