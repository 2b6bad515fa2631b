"""Physical-plan inspection utilities (plan-shape regression tests)."""
