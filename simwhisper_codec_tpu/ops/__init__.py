"""TPU-native compute ops: mel frontend, FSQ, convs, attention, ISTFT, Snake."""
