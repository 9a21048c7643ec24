"""py4j reflection-resolution cache: remove 2 of the 3 JVM roundtrips
every ``F.*`` call pays (guide §4 — the Python/JVM boundary).

MEASURED (r17, txn_sql_dml, one warm pass, send_command tracing): 4,223
main-thread py4j roundtrips, of which **1,542 are reflection lookups**
('r' commands) — py4j resolves ``jvm.functions`` (``JVMView.
__getattr__``) and the static member ``functions.col`` (``JavaClass.
__getattr__``) over the network on EVERY pyspark ``_invoke_function``
call, with no cache::

    F.col("x")  ->  r:functions  +  r:functions.col  +  c:call

Both resolutions are deterministic for the life of a JVM: a package/
class FQN never changes what it resolves to, and a static METHOD
member is a stateless ``JavaMember`` handle. Caching them per
``(gateway_client, fqn, name)`` turns every expression construction
from 3 roundtrips into 1 — library-wide, every lane, every operator —
at a driver-side latency of ~0.3 ms/roundtrip on this host (more under
load; py4j roundtrips serialize on the driver thread).

What is deliberately NOT cached:

* ``JavaClass.__getattr__`` answers that are neither ``JavaMember``
  nor ``JavaClass``: those are **static field values** (py4j's third
  success branch) — a mutable field must be re-read every access.
* Failed resolutions (``Py4JError`` / ``AttributeError``): feature-
  detection ``hasattr`` patterns must keep probing the JVM.
* ``JavaObject`` member access: py4j already resolves instance members
  lazily with no network roundtrip.

The cache key includes ``id(gateway_client)`` so a restarted gateway
(new JVM) can never serve another JVM's handles. Dict get/set under
the GIL makes races benign (worst case: both threads resolve, one
overwrite). Installed idempotently from ``session.get_spark`` /
``ensure_runtime_confs`` — i.e. before any lane code runs, for both
self-created and driver-supplied sessions.
"""

from __future__ import annotations

_INSTALLED = False


def install_py4j_reflection_cache() -> None:
    """Idempotently wrap ``JVMView.__getattr__`` / ``JavaClass.
    __getattr__`` with success-only caches of their stateless results."""
    global _INSTALLED
    if _INSTALLED:
        return
    try:
        from py4j.java_gateway import JavaClass, JavaMember, JavaPackage, JVMView
    except ImportError:  # pragma: no cover - no py4j, nothing to cache
        _INSTALLED = True
        return

    if getattr(JVMView.__getattr__, "__py4j_hotpath__", False):
        _INSTALLED = True
        return

    _view_orig = JVMView.__getattr__
    _cls_orig = JavaClass.__getattr__
    view_cache: dict = {}
    cls_cache: dict = {}

    def _view_getattr(self, name):
        key = (id(self._gateway_client), self._id, name)
        hit = view_cache.get(key)
        if hit is not None:
            return hit
        out = _view_orig(self, name)
        # packages and classes are immutable resolutions for this JVM
        if isinstance(out, (JavaPackage, JavaClass)):
            view_cache[key] = out
        return out

    def _cls_getattr(self, name):
        key = (id(self._gateway_client), self._fqn, name)
        hit = cls_cache.get(key)
        if hit is not None:
            return hit
        out = _cls_orig(self, name)
        # static METHODS (JavaMember) and inner CLASSES are stateless
        # handles; anything else is a static FIELD VALUE — never cached
        if isinstance(out, (JavaMember, JavaClass)):
            cls_cache[key] = out
        return out

    _view_getattr.__py4j_hotpath__ = True
    _cls_getattr.__py4j_hotpath__ = True
    JVMView.__getattr__ = _view_getattr
    JavaClass.__getattr__ = _cls_getattr
    _INSTALLED = True
