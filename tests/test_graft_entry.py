"""The driver entry points must work in a CLEAN environment.

``dryrun_multichip`` is the driver's multi-chip validation: it runs in a
fresh process with no repo conftest and (on this box) a tunneled TPU
plugin that wins platform selection over the ``JAX_PLATFORMS`` env var.
The function must therefore pin the CPU platform and the forced host
device count itself — this test launches it exactly the way the driver
does, with XLA_FLAGS/JAX_PLATFORMS scrubbed, and would have caught the
round-2 regression where the plugin hijacked the platform and the dry
run saw one device.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_dryrun_multichip_clean_env():
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # prepend-and-preserve (same pattern as test_multiprocess.py): jax or
    # other deps may themselves be supplied via an inherited PYTHONPATH
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    # keep the subprocess off any tunneled accelerator runtime entirely:
    # the dry run must not depend on one being reachable
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, f"dryrun failed:\n{r.stdout}\n{r.stderr}"
    assert "OK" in r.stdout
