#!/usr/bin/env python
"""Drop-in counterpart of the reference's root-level analyze_robustness.py
(analyze_robustness.py:229-234): reads per-frame metric files under
``outputs/`` and plots the robustness sweeps (metric vs window duration,
events-per-window, keep_ratio, and event-rate deciles).

The implementation lives in analysis/robustness.py; this shim keeps the
reference's invocation (``python analyze_robustness.py``) working unchanged.
"""

from analysis.robustness import main

if __name__ == "__main__":
    main()
