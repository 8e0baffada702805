# demo: sphere + cylinder + mesh on a mirror floor
camera 0 1.4 6.5  0 0.3 0  0 1 0  45 640 480
light 3 6 5  0.75 0.75 0.7
light -4 4 3  0.25 0.25 0.3
background 0.02 0.02 0.05
ambience 0.2 0.2 0.2
depth 3
sphere -1.4 0.2 0.6 0.8  0.25 0.02 0.02  0.6 0.05 0.05  0.5 0.5 0.5  60 0.25
cylinder 1.5 0.25 -0.4  0.15 1 0  0.55 1.5  0.02 0.1 0.2  0.1 0.35 0.6  0.4 0.4 0.4  40 0.1
plane 0 -0.6 0  0 1 0  0.08 0.08 0.08  0.4 0.4 0.4  0.1 0.1 0.1  8 0.2
mesh blob.off PHONG
