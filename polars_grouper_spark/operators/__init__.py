"""Graph/mining operators (reference parity surface)."""
