"""Pure scalar/batch functions shared by the Ray stages and the oracle."""
