"""TPU-native compute ops: pure-JAX / Pallas building blocks for the hot paths."""
