"""CoRL2017 benchmark package."""
