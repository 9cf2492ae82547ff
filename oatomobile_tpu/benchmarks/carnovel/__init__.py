"""CARNOVEL benchmark package."""
