"""Ray Data stage implementations (map_batches / map_groups callables)."""
