"""Offline data pipelines: grasp-label dataset generation, YCB cloud rendering."""
