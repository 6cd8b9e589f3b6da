"""Model layer: LeapfrogLayer networks, generalized-leapfrog dynamics, loss."""
