"""Robot/ROS integration layer (host-side; ROS imports are gated)."""
