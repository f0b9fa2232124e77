"""Multi-device execution: meshes, data-parallel training steps."""
