"""OpenFace 68-point facial landmark alignment template.

Public alignment constants (OpenFace project), identical to the template
embedded in the reference (reference: deep_insight_face/api.py:29-66).
Generated data file — not hand-edited.
"""

import numpy as np

TEMPLATE = np.array([
    (np.float64(0.0792396913815), np.float64(0.339223741112)),
    (np.float64(0.0829219487236), np.float64(0.456955367943)),
    (np.float64(0.0967927109165), np.float64(0.575648016728)),
    (np.float64(0.122141515615), np.float64(0.691921601066)),
    (np.float64(0.168687863544), np.float64(0.800341263616)),
    (np.float64(0.239789390707), np.float64(0.895732504778)),
    (np.float64(0.325662452515), np.float64(0.977068762493)),
    (np.float64(0.422318282013), np.float64(1.04329000149)),
    (np.float64(0.531777802068), np.float64(1.06080371126)),
    (np.float64(0.641296298053), np.float64(1.03981924107)),
    (np.float64(0.738105872266), np.float64(0.972268833998)),
    (np.float64(0.824444363295), np.float64(0.889624082279)),
    (np.float64(0.894792677532), np.float64(0.792494155836)),
    (np.float64(0.939395486253), np.float64(0.681546643421)),
    (np.float64(0.96111933829), np.float64(0.562238253072)),
    (np.float64(0.970579841181), np.float64(0.441758925744)),
    (np.float64(0.971193274221), np.float64(0.322118743967)),
    (np.float64(0.163846223133), np.float64(0.249151738053)),
    (np.float64(0.21780354657), np.float64(0.204255863861)),
    (np.float64(0.291299351124), np.float64(0.192367318323)),
    (np.float64(0.367460241458), np.float64(0.203582210627)),
    (np.float64(0.4392945113), np.float64(0.233135599851)),
    (np.float64(0.586445962425), np.float64(0.228141644834)),
    (np.float64(0.660152671635), np.float64(0.195923841854)),
    (np.float64(0.737466449096), np.float64(0.182360984545)),
    (np.float64(0.813236546239), np.float64(0.192828009114)),
    (np.float64(0.8707571886), np.float64(0.235293377042)),
    (np.float64(0.51534533827), np.float64(0.31863546193)),
    (np.float64(0.516221448289), np.float64(0.396200446263)),
    (np.float64(0.517118861835), np.float64(0.473797687758)),
    (np.float64(0.51816430343), np.float64(0.553157797772)),
    (np.float64(0.433701156035), np.float64(0.604054457668)),
    (np.float64(0.475501237769), np.float64(0.62076344024)),
    (np.float64(0.520712933176), np.float64(0.634268222208)),
    (np.float64(0.565874114041), np.float64(0.618796581487)),
    (np.float64(0.607054002672), np.float64(0.60157671656)),
    (np.float64(0.252418718401), np.float64(0.331052263829)),
    (np.float64(0.298663015648), np.float64(0.302646354002)),
    (np.float64(0.355749724218), np.float64(0.303020650651)),
    (np.float64(0.403718978315), np.float64(0.33867711083)),
    (np.float64(0.352507175597), np.float64(0.349987615384)),
    (np.float64(0.296791759886), np.float64(0.350478978225)),
    (np.float64(0.631326076346), np.float64(0.334136672344)),
    (np.float64(0.679073381078), np.float64(0.29645404267)),
    (np.float64(0.73597236153), np.float64(0.294721285802)),
    (np.float64(0.782865376271), np.float64(0.321305281656)),
    (np.float64(0.740312274764), np.float64(0.341849376713)),
    (np.float64(0.68499850091), np.float64(0.343734332172)),
    (np.float64(0.353167761422), np.float64(0.746189164237)),
    (np.float64(0.414587777921), np.float64(0.719053835073)),
    (np.float64(0.477677654595), np.float64(0.706835892494)),
    (np.float64(0.522732900812), np.float64(0.717092275768)),
    (np.float64(0.569832064287), np.float64(0.705414478982)),
    (np.float64(0.635195811927), np.float64(0.71565572516)),
    (np.float64(0.69951672331), np.float64(0.739419187253)),
    (np.float64(0.639447159575), np.float64(0.805236879972)),
    (np.float64(0.576410514055), np.float64(0.835436670169)),
    (np.float64(0.525398405766), np.float64(0.841706377792)),
    (np.float64(0.47641545769), np.float64(0.837505914975)),
    (np.float64(0.41379548902), np.float64(0.810045601727)),
    (np.float64(0.380084785646), np.float64(0.749979603086)),
    (np.float64(0.477955996282), np.float64(0.74513234612)),
    (np.float64(0.523389793327), np.float64(0.748924302636)),
    (np.float64(0.571057789237), np.float64(0.74332894691)),
    (np.float64(0.672409137852), np.float64(0.744177032192)),
    (np.float64(0.572539621444), np.float64(0.776609286626)),
    (np.float64(0.5240106503), np.float64(0.783370783245)),
    (np.float64(0.477561227414), np.float64(0.778476346951)),
], dtype=np.float32)

TPL_MIN = TEMPLATE.min(axis=0)
TPL_MAX = TEMPLATE.max(axis=0)
MINMAX_TEMPLATE = (TEMPLATE - TPL_MIN) / (TPL_MAX - TPL_MIN)

#: landmark indices used by the reference thumbnail alignment
#: (reference: api.py:27-28)
INNER_EYES_AND_BOTTOM_LIP = (39, 42, 57)
OUTER_EYES_AND_NOSE = (36, 45, 33)
