"""§2 — placeholder, populated in later phases."""
