"""Auxiliary subsystems: visualization, terrain reconstruction, evaluation, profiling."""
