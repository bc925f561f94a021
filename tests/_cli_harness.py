"""Shared in-process CLI runner for the suite.

Driving a CLI main() in this process instead of a subprocess shares the
warm interpreter, JAX runtime, and compile LRU with the rest of the suite —
a subprocess pays ~10 s interpreter+jax startup per invocation on this
1-core host. Restores cwd/env/warnings filters afterwards (the
numpy-warning tripwire the drivers install must not leak between tests).

Used both for --dry-run surface tests and full tiny training runs; the
CLIs are written re-entrantly (no module-level mutable run state beyond
the global run-id, which each run sets for itself).
"""

import importlib
import os
import warnings


def run_cli_inproc(module, config, run_id="99", extra=(), env_extra=None,
                   cwd=None):
    """Call mmtpu CLI `module`.main() in-process. Returns the exit code;
    assert stdout via the capfd fixture when needed (rich resolves
    sys.stdout at write time, so fd-level capture sees it)."""
    mod = importlib.import_module(module)
    old_cwd = os.getcwd()
    old_env = dict(os.environ)
    old_filters = warnings.filters[:]
    try:
        if cwd is not None:
            os.chdir(cwd)
        if env_extra:
            os.environ.update(env_extra)
        code = mod.main(["--config", str(config), "--run_id", run_id,
                         "--cpu", *extra])
    except SystemExit as e:  # argparse error paths
        # sys.exit("message") carries a string code (exit status 1); keep
        # the message visible instead of crashing on int("message")
        if e.code is None:
            code = 0
        elif isinstance(e.code, int):
            code = e.code
        else:
            print(f"SystemExit: {e.code}")
            code = 1
    finally:
        os.chdir(old_cwd)
        os.environ.clear()
        os.environ.update(old_env)
        warnings.filters[:] = old_filters
    return code
