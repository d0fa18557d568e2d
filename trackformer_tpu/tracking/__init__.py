from .tracker import Tracker, TrackerConfig, TrackerState  # noqa: F401
