from .manifest import Manifest, RoundManifest, ManifestEntry
from .transcript import Transcript
