from .timing import TimingTree, profiling_enable, timed_span  # noqa: F401
