package com.ibm.mq;

import java.io.IOException;
import java.util.GregorianCalendar;

/** OFFLINE COMPILE-CHECK STUB — see {@link MQException} header. */
public class MQMessage {
    public int characterSet;
    public int sequenceNumber;
    public GregorianCalendar putDateTime;

    public int getMessageLength() throws IOException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void readFully(byte[] dst) throws IOException {
        throw new UnsupportedOperationException("offline API stub");
    }

    public void writeString(String s) throws IOException {
        throw new UnsupportedOperationException("offline API stub");
    }
}
