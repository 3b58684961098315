"""Fetch/download condition evaluation — sync, async and callback forms.

The reference accepts both synchronous predicates and callback-async
ones (``(queueItem, referrerQueueItem, callback)``,
src/crawler.ts:1230-1261; behavior pinned by
test/specs/conditions.integration.spec.ts:18-253): an async condition
decides via ``callback(error, decision)``, and an error — thrown or
passed — maps to ``fetchconditionerror`` and drops the candidate.
``async.every`` WAITS for every callback, so a deferred veto/error is
never dropped.

Python equivalents supported here:

* plain callable ``cond(queue_item) -> bool``  (sync, the hot path),
* two-arg sync ``cond(queue_item, referrer_item) -> bool`` — the
  reference's ``(queueItem, referrerQueueItem)`` shape.  An arity-2
  callable is treated as callback-style ONLY if its second parameter
  is named ``done`` / ``callback`` / ``cb``; any other name means the
  sync referrer shape,
* coroutine function ``async def cond(queue_item) -> bool``,
* callback style ``cond(queue_item, done)`` or the reference's
  three-arg ``cond(queue_item, referrer_item, done)``, where the
  condition calls ``done(error=None, decision=True)``.  If ``done``
  has not been called when the condition returns (e.g. it handed the
  callback to a thread), evaluation BLOCKS up to ``timeout`` seconds
  for it; a callback that never fires raises ``ConditionError``
  instead of silently passing.

Raised exceptions and callback errors both propagate to the caller,
which counts ``fetchconditionerror`` / ``downloadconditionerror`` —
exactly the sync semantics, for all shapes.
"""

from __future__ import annotations

import asyncio
import inspect
import threading
from typing import Any, Callable

_LOOP: "asyncio.AbstractEventLoop | None" = None

#: seconds a deferred callback condition may take before it errors —
#: mirrors the reference's listenerTTL default (src/crawler.ts:313).
CALLBACK_TIMEOUT = 10.0

_CALLBACK_PARAM_NAMES = {"done", "callback", "cb"}


def _loop() -> asyncio.AbstractEventLoop:
    global _LOOP
    if _LOOP is None or _LOOP.is_closed():
        _LOOP = asyncio.new_event_loop()
    return _LOOP


_SHAPE_CACHE: dict = {}


def _positional_params(fn: Callable):
    """Positional parameters of a condition, cached per callable —
    signature() costs ~10us and eval_condition runs per candidate row
    in the hot loop; a condition's shape never changes."""
    try:
        return _SHAPE_CACHE[fn]
    except TypeError:
        pass  # unhashable callable: inspect every time
    except KeyError:
        pass
    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        out = None
    else:
        out = [p for p in params
               if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
    try:
        if len(_SHAPE_CACHE) > 10_000:
            _SHAPE_CACHE.clear()
        _SHAPE_CACHE[fn] = out
    except TypeError:
        pass
    return out


class ConditionError(RuntimeError):
    """An async condition reported an error via callback(err, ...) or
    never invoked its callback within the timeout."""


def _run_callback_style(cond: Callable, args: tuple, timeout: float) -> bool:
    result: dict[str, Any] = {}
    fired = threading.Event()

    def done(error=None, decision=True):
        result["error"] = error
        result["decision"] = decision
        fired.set()

    cond(*args, done)
    if not fired.is_set() and not fired.wait(timeout):
        raise ConditionError(
            "condition did not invoke its callback within "
            f"{timeout}s: {getattr(cond, '__name__', cond)!r}")
    err = result.get("error")
    if err is not None:
        if isinstance(err, BaseException):
            raise err
        raise ConditionError(str(err))
    return bool(result.get("decision", True))


def eval_condition(cond: Callable, queue_item: dict,
                   referrer_item: "dict | None" = None,
                   timeout: float = CALLBACK_TIMEOUT) -> bool:
    """Evaluate one condition against a queue-item dict.  Returns the
    boolean decision; raises on error (the caller maps the raise to
    ``fetchconditionerror`` / ``downloadconditionerror``)."""
    if inspect.iscoroutinefunction(cond):
        return bool(_loop().run_until_complete(cond(queue_item)))
    params = _positional_params(cond)
    # classify by REQUIRED positional arity: defaulted extras (e.g.
    # cond(qi, ref=None, verbose=False)) must not be mistaken for the
    # reference's (queue_item, referrer_item, callback) shape — that
    # mistake blocked CALLBACK_TIMEOUT per row then errored every row
    arity = (len([p for p in params if p.default is p.empty])
             if params is not None else 1)
    if params is not None and arity < len(params):
        # optional params only count toward the shape when the last
        # one is callback-named (a deliberately-defaulted callback)
        if params[len(params) - 1].name in _CALLBACK_PARAM_NAMES:
            arity = len(params)
        elif arity < 2 <= len(params):
            arity = 2  # (qi, ref=None, ...) keeps the two-arg shape
    if arity >= 3:
        # reference shape: cond(queue_item, referrer_item, callback)
        return _run_callback_style(cond, (queue_item, referrer_item), timeout)
    if arity == 2:
        name = params[1].name if params is not None else ""
        if name in _CALLBACK_PARAM_NAMES:
            return _run_callback_style(cond, (queue_item,), timeout)
        # sync two-arg (queueItem, referrerQueueItem) shape
        try:
            out = cond(queue_item, referrer_item)
        except TypeError as e:
            # a callback-style condition whose second parameter is NOT
            # named done/callback/cb lands here and tries to call the
            # referrer dict (or None) — surface the rename requirement
            # instead of a bare "'dict' object is not callable".  Only
            # hint when the non-callable TYPE is the referrer's own
            # type; a TypeError from calling some unrelated object in
            # the condition's body keeps its original message
            ref_type = type(referrer_item).__name__
            if f"'{ref_type}' object is not callable" in str(e):
                raise ConditionError(
                    f"condition {getattr(cond, '__name__', cond)!r} raised "
                    f"{e!r}; if its second parameter is a completion "
                    "callback, name it one of "
                    f"{sorted(_CALLBACK_PARAM_NAMES)} so the engine passes "
                    "a callback instead of the referrer queue-item") from e
            raise
        if inspect.isawaitable(out):
            return bool(_loop().run_until_complete(out))
        return bool(out)
    out = cond(queue_item)
    if inspect.isawaitable(out):  # async lambda / partial of coroutine
        return bool(_loop().run_until_complete(out))
    return bool(out)
