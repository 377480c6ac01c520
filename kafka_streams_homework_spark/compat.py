"""Environment compatibility shims.

``transformWithStateInPandas`` (the Spark-4 StatefulProcessor API,
streaming/stateful_v2.py) talks to the JVM state server over protobuf,
so the Python driver AND the Python UDF workers need ``google.protobuf``.
This container has no pip-installed protobuf, but ships a modern
vendored copy (6.x) inside the Google Cloud SDK tree. ``ensure_protobuf``
makes it importable when the real package is absent — and extends
``PYTHONPATH`` so executor-side Python workers (forked from a daemon
that inherits the driver's environment) can import it too. Call it
before the SparkSession starts; it is a no-op when protobuf is already
importable or no vendored copy exists.
"""

from __future__ import annotations

import importlib.util
import os
import sys

# Known locations of vendored protobuf copies, newest-first. Each entry
# is a sys.path root whose ``google/protobuf`` subtree is a complete
# runtime (checked before use).
_VENDORED_PROTOBUF_ROOTS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",  # protobuf 6.x
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk",  # protobuf 4.x
]


def protobuf_available() -> bool:
    return importlib.util.find_spec("google.protobuf.descriptor") is not None


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable if at all possible.

    Returns True when protobuf is importable afterwards. Never raises.
    """
    try:
        if protobuf_available():
            return True
    except Exception:
        pass
    for root in _VENDORED_PROTOBUF_ROOTS:
        if not os.path.isfile(
            os.path.join(root, "google", "protobuf", "descriptor.py")
        ):
            continue
        if root not in sys.path:
            # append, not prepend: the vendored tree carries unrelated
            # top-level modules that must never shadow the real ones
            sys.path.append(root)
        pp = os.environ.get("PYTHONPATH", "")
        if root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = f"{pp}{os.pathsep}{root}" if pp else root
        try:
            if protobuf_available():
                _install_version_shim()
                return True
        except Exception:
            continue
    return False


def _install_version_shim() -> None:
    """Put the _pb_shim dir (sitecustomize.py) on sys.path/PYTHONPATH so
    every Python process — including Spark's state-server and UDF
    workers — relaxes protobuf's same-major gencode>runtime hard-fail
    (vendored runtime 6.32 vs PySpark's gencode 6.33). Applied to the
    current process immediately; new processes pick it up via
    sitecustomize at startup."""
    shim_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pb_shim")
    if not os.path.isfile(os.path.join(shim_dir, "sitecustomize.py")):
        return
    if shim_dir not in sys.path:
        sys.path.insert(0, shim_dir)
    pp = os.environ.get("PYTHONPATH", "")
    if shim_dir not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{shim_dir}{os.pathsep}{pp}" if pp else shim_dir
        )
    import sitecustomize  # noqa: F401  (patch this process too)
