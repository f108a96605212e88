"""Small bundled data fixtures (public-domain text only)."""
