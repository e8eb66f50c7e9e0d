"""Shipped model configs (mirror of the reference configs/)."""
