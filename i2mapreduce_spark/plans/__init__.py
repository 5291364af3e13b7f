"""Plan-level utilities: the iterative-computation driver (the reference's
persistent-task loop, ref op A10) and plan inspection helpers."""

from .iterate import iterate, IterationResult  # noqa: F401
