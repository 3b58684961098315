"""Fetch/download condition evaluation — sync, async and callback forms.

The reference accepts both synchronous predicates and callback-async
ones (arity-3 ``(queueItem, referrerQueueItem, callback)``,
src/crawler.ts:1230-1261; behavior pinned by
test/specs/conditions.integration.spec.ts:18-253): an async condition
decides via ``callback(error, decision)``, and an error — thrown or
passed — maps to ``fetchconditionerror`` and drops the candidate.

Python equivalents supported here:

* plain callable ``cond(queue_item) -> bool``  (sync, the hot path),
* coroutine function ``async def cond(queue_item) -> bool``,
* callback style ``cond(queue_item, done)`` where the condition calls
  ``done(error=None, decision=True)``.

Raised exceptions and callback errors both propagate to the caller,
which counts ``fetchconditionerror`` / ``downloadconditionerror`` —
exactly the sync semantics, now for all three shapes.
"""

from __future__ import annotations

import asyncio
import inspect
from typing import Any, Callable

_LOOP: "asyncio.AbstractEventLoop | None" = None


def _loop() -> asyncio.AbstractEventLoop:
    global _LOOP
    if _LOOP is None or _LOOP.is_closed():
        _LOOP = asyncio.new_event_loop()
    return _LOOP


def _arity(fn: Callable) -> int:
    try:
        params = inspect.signature(fn).parameters.values()
        return sum(1 for p in params
                   if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD))
    except (TypeError, ValueError):
        return 1


class ConditionError(RuntimeError):
    """An async condition reported an error via callback(err, ...)."""


def eval_condition(cond: Callable, queue_item: dict) -> bool:
    """Evaluate one condition against a queue-item dict.  Returns the
    boolean decision; raises on error (the caller maps the raise to
    ``fetchconditionerror`` / ``downloadconditionerror``)."""
    if inspect.iscoroutinefunction(cond):
        return bool(_loop().run_until_complete(cond(queue_item)))
    if _arity(cond) >= 2:
        # callback style: cond(queue_item, done)
        result: dict[str, Any] = {}

        def done(error=None, decision=True):
            result["error"] = error
            result["decision"] = decision

        cond(queue_item, done)
        err = result.get("error")
        if err is not None:
            if isinstance(err, BaseException):
                raise err
            raise ConditionError(str(err))
        return bool(result.get("decision", True))
    out = cond(queue_item)
    if inspect.isawaitable(out):  # async lambda / partial of coroutine
        return bool(_loop().run_until_complete(out))
    return bool(out)
