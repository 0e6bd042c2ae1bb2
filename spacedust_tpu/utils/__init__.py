"""Runtime utilities: leveled logging, progress bars, timers."""
