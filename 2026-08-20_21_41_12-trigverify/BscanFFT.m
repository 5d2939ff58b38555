% Parameters were - camgain, camtime, bpp, w , h , camspeed, usbtraffic, binvalue, bscanthreshold
% 12, 1000, 8, 64, 32, 2, 0, 1, -30
