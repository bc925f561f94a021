"""The fd-2 filter for XLA:CPU AOT loader pseudo-feature warnings."""

import os
import subprocess
import sys

from mmtpu.utils.stderr_filter import _is_benign, suppress_benign_aot_warnings

BENIGN = (
    "E0820 09:24:24.050033 11519 cpu_aot_loader.cc:210] Loading XLA:CPU AOT "
    "result. Target machine feature +prefer-no-gather is not  supported on "
    "the host machine. Machine type used for XLA:CPU compilation doesn't "
    "match the machine type for execution. Compile machine features: "
    "[+64bit,+avx,+prefer-no-scatter,+prefer-no-gather] vs host machine "
    "features: [avx,64bit]. This could lead to execution errors such as "
    "SIGILL."
)
# a REAL cross-machine mismatch names an ISA feature — must pass through
REAL = BENIGN.replace(
    "feature +prefer-no-gather is not  supported",
    "feature +avx512f is not  supported",
)


def test_benign_classifier():
    assert _is_benign(BENIGN)
    assert not _is_benign(REAL)
    assert not _is_benign("some other error mentioning SIGILL")
    # no feature clause at all -> not classifiable as benign -> keep
    assert not _is_benign("cpu_aot_loader.cc] ... doesn't match ...")


def test_fd_level_filtering_end_to_end():
    """Native-style writes to fd 2 are filtered; real lines pass through."""
    code = f"""
import os, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from mmtpu.utils.stderr_filter import suppress_benign_aot_warnings
with suppress_benign_aot_warnings():
    os.write(2, {BENIGN!r}.encode() + b"\\n")
    os.write(2, {REAL!r}.encode() + b"\\n")
    os.write(2, b"plain native line\\n")
    print("python-level stderr", file=sys.stderr)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    # the benign line (its unsupported-feature clause) is dropped...
    assert "feature +prefer-no-gather is not" not in out.stderr
    # ...the real-ISA mismatch passes through (even though its compile
    # feature LIST still mentions pseudo-features)
    assert "feature +avx512f is not" in out.stderr
    assert "plain native line" in out.stderr
    assert "python-level stderr" in out.stderr
