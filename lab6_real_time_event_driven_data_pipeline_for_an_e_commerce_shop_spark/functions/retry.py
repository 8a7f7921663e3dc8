"""Control-plane retry with exponential backoff (SURVEY.md §2.6 ST6).

The reference decorates S3/pyarrow calls with a 3-attempt, 2^n-delay
retry (reference validate.py:84-104) and configures the same policy in
Step Functions (stepfunction.json:53-69) and the DynamoDB writer
(transform.py:243-255). In this engine Spark's own task retries
(``spark.task.maxFailures``) cover the data plane; this helper covers
*driver-side control-plane* calls (object-store metadata ops, external
sinks inside foreachBatch) where an app-level retry is still the right
tool.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable
from typing import TypeVar

log = logging.getLogger(__name__)
T = TypeVar("T")


def retry_on_failure(
    max_attempts: int = 3,
    base_delay: float = 1.0,
    backoff: float = 2.0,
    retryable: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
):
    """Decorator: retry ``max_attempts`` times with delay
    base_delay·backoff^n between attempts (reference validate.py:84-104
    semantics: 1s, 2s, 4s). Raises the last error when exhausted."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs) -> T:
            last: BaseException | None = None
            for attempt in range(max_attempts):
                try:
                    return fn(*args, **kwargs)
                except retryable as exc:  # noqa: PERF203
                    last = exc
                    if attempt + 1 < max_attempts:
                        delay = base_delay * (backoff**attempt)
                        log.warning(
                            "attempt %d/%d of %s failed (%s); retrying in %.1fs",
                            attempt + 1, max_attempts, fn.__name__, exc, delay,
                        )
                        sleep(delay)
            assert last is not None
            raise last

        return wrapped

    return deco
