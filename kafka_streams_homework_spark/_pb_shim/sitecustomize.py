"""Vendored-protobuf version-check shim (see compat.ensure_protobuf).

Only on sys.path when compat.py fell back to a VENDORED protobuf
runtime (no pip-installed one exists). PySpark 4.1's generated
StateMessage_pb2 declares gencode 6.33; the newest vendored runtime in
this container is 6.32, and protobuf's ValidateProtobufRuntimeVersion
hard-fails when gencode > runtime even within the same major version.
For the pure-Python runtime that delta is descriptor-API-compatible, so
rather than dropping transformWithStateInPandas entirely we relax the
check to a warning — SAME-MAJOR mismatches only; cross-major still
fails loudly. Python imports ``sitecustomize`` in every interpreter at
startup, which is exactly the hook needed to patch the check inside
Spark's state-server and UDF worker processes, not just the driver.
"""

try:
    import warnings

    from google.protobuf import runtime_version as _rv

    _original = _rv.ValidateProtobufRuntimeVersion

    def _tolerant_validate(
        gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
    ):
        try:
            _original(
                gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
            )
        except _rv.VersionError:
            if gen_domain != _rv.DOMAIN or gen_major != _rv.MAJOR:
                raise  # cross-domain / cross-major: genuinely unsafe
            warnings.warn(
                f"protobuf gencode {gen_major}.{gen_minor}.{gen_patch} newer "
                f"than vendored runtime {_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH} "
                f"({location}); proceeding (same-major, pure-Python runtime)"
            )

    _rv.ValidateProtobufRuntimeVersion = _tolerant_validate
except Exception:  # no protobuf on path — nothing to shim
    pass
