"""Core compute ops: neighbor graphs, RBF expansions, and the FGW/OT solver."""
