"""Native Column builders shared across operators."""
