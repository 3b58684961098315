"""Condition-shape semantics (SURVEY §2.10 / conditions.integration.spec.ts):
sync one/two-arg, coroutine, callback two/three-arg, deferred callbacks."""

import threading

import pytest

from simplecrawler_ray.conditions import ConditionError, eval_condition

QI = {"url": "http://x/", "path": "/", "depth": 2}
REF = {"url": "http://x/ref", "depth": 1}


def test_sync_one_arg():
    assert eval_condition(lambda qi: qi["depth"] == 2, QI) is True
    assert eval_condition(lambda qi: False, QI) is False


def test_sync_two_arg_referrer_shape():
    """Reference (queueItem, referrerQueueItem) sync shape: second param
    NOT named done/callback/cb -> receives the referrer item, result is
    the return value (previously misclassified as callback + always
    passed)."""
    seen = {}

    def cond(queue_item, referrer_item):
        seen["ref"] = referrer_item
        return referrer_item is not None and referrer_item["depth"] == 1

    assert eval_condition(cond, QI, REF) is True
    assert seen["ref"] == REF
    assert eval_condition(cond, QI, None) is False


def test_callback_two_arg():
    def cond(qi, done):
        done(None, qi["depth"] == 2)

    assert eval_condition(cond, QI) is True

    def veto(qi, done):
        done(None, False)

    assert eval_condition(veto, QI) is False


def test_callback_three_arg_reference_shape():
    def cond(qi, ref, callback):
        callback(None, ref["depth"] == 1)

    assert eval_condition(cond, QI, REF) is True


def test_callback_error_raises():
    def cond(qi, done):
        done("boom")

    with pytest.raises(ConditionError):
        eval_condition(cond, QI)

    def cond2(qi, done):
        done(RuntimeError("typed boom"))

    with pytest.raises(RuntimeError):
        eval_condition(cond2, QI)


def test_deferred_callback_veto_not_dropped():
    """A callback fired from another thread after the condition returns
    must still decide the outcome (the reference's async.every waits)."""
    def cond(qi, done):
        threading.Timer(0.05, lambda: done(None, False)).start()

    assert eval_condition(cond, QI) is False


def test_callback_never_fired_raises_not_passes():
    def cond(qi, done):
        pass  # forgets the callback entirely

    with pytest.raises(ConditionError):
        eval_condition(cond, QI, timeout=0.1)


def test_coroutine_condition():
    async def cond(qi):
        return qi["depth"] == 2

    assert eval_condition(cond, QI) is True


def test_misnamed_callback_param_gets_clear_error():
    """Round-3 advice #4: a callback-style condition whose second param
    is NOT named done/callback/cb is interpreted as the sync referrer
    shape; when it then calls the referrer dict, the error names the
    rename requirement instead of a bare TypeError."""
    def cond(qi, finish):  # intended as callback-style, misnamed
        finish(None, True)

    with pytest.raises(ConditionError, match="done"):
        eval_condition(cond, QI, REF)
    # with referrer=None, calling None is equally guided
    with pytest.raises(ConditionError, match="callback"):
        eval_condition(cond, QI, None)


def test_sync_two_arg_typeerror_inside_body_not_masked():
    """A genuine TypeError raised inside a sync two-arg condition body
    (not from calling the referrer) propagates unchanged."""
    def cond(qi, ref):
        return len(qi["depth"])  # TypeError: int has no len()

    with pytest.raises(TypeError):
        eval_condition(cond, QI, REF)


def test_sync_condition_with_defaulted_extras_is_not_callback():
    """cond(qi, ref=None, verbose=False) is a SYNC condition — the old
    total-arity rule classified it callback-style, blocking the 10s
    timeout per row and erroring every candidate."""
    import time

    from simplecrawler_ray.conditions import eval_condition

    def cond(queue_item, referrer=None, verbose=False):
        return queue_item["path"] != "/blocked"

    t0 = time.time()
    assert eval_condition(cond, {"path": "/ok"}, {"path": "/r"}) is True
    assert eval_condition(cond, {"path": "/blocked"}) is False
    assert time.time() - t0 < 2.0  # no callback-timeout stall


def test_defaulted_callback_param_still_callback_style():
    from simplecrawler_ray.conditions import eval_condition

    def cond(queue_item, referrer_item, done=None):
        done(None, queue_item["path"] == "/yes")

    assert eval_condition(cond, {"path": "/yes"}, {}) is True
    assert eval_condition(cond, {"path": "/no"}, {}) is False
