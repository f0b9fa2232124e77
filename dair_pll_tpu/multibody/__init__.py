"""Multibody dynamics: model description, kinematics, dynamics terms,
contact, and the learnable system."""
