"""dair_pll_tpu: TPU-native differentiable contact-dynamics system
identification.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DAIRLab/dair_pll:
learn inertia, friction, and geometry of rigid multibody systems undergoing
frictional contact, by gradient descent through a differentiable contact
simulator (Anitescu convex stepping) or the ContactNets implicit loss —
batched, jitted, and shardable over TPU meshes.
"""

__version__ = "0.1.0"
