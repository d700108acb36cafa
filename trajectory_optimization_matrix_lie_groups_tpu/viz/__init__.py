"""Host-side visualization (matplotlib; optional — compute never needs it)."""
