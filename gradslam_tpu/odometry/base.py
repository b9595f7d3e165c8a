r"""Abstract odometry provider interface (parity with
``/root/reference/gradslam/odometry/base.py:6``)."""

from abc import ABC, abstractmethod

__all__ = ["OdometryProvider"]


class OdometryProvider(ABC):
    r"""Base class for all odometry providers. ``provide`` returns relative
    transforms ``(B, 1, 4, 4)`` aligning the second argument to the first."""

    @abstractmethod
    def provide(self, *args, **kwargs):
        """Compute relative transforms ``(B, 1, 4, 4)`` aligning the
        second argument to the first (reference base.py:17)."""
        raise NotImplementedError
