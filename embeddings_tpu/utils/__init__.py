from .benchmarking import device_time_us, wallclock_throughput

__all__ = ["device_time_us", "wallclock_throughput"]
