"""Sources: synthetic tick generators (batch + streaming) mirroring the
reference's mock gateways, and file-source helpers."""
